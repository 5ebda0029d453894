"""Text-analysis operators over the ``documents`` table.

North-star extensions (BASELINE.json; SURVEY.md §2.C): language ID,
quality scoring, token counting, document fingerprinting. All are pure
column expressions (JVM-side, whole-stage codegen) — no Python UDFs in
the hot path, so they scale linearly with input and never shuffle
except for explicit aggregations.

Each operator has an exact DuckDB oracle: the heuristics are defined
as deterministic arithmetic so the differential gate is meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_db_query_engine_elasticsearch_indexer_spark.functions import (
    DUCK_TOKENS,
    TOKENS,
    array_lit as _array_lit,
    list_lit as _list_lit,
)

# Stopword sets for the language-ID heuristic (fixed, tiny, broadcast as
# literals inside the expression — no side data needed).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "a", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "y", "es", "un", "en"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
}


def quality_blend(toks: str = TOKENS, text: str = "text") -> str:
    """Spark dialect of THE quality composite (unrounded): the single
    definition every consumer shares (quality_score, source_stats,
    dedup.keep_best) so the scoring and the canonical-selection policy
    can never silently desynchronize. 0.4·length-saturation +
    0.4·stopword-ratio + 0.2·(1 − punctuation-ratio)."""
    stop = _array_lit(LANG_STOPWORDS["en"])
    return (
        f"0.4 * least(size({toks}) / 100.0, 1.0)"
        f" + 0.4 * (size(filter({toks}, w -> array_contains({stop}, w))) / size({toks}))"
        f" + 0.2 * (1.0 - (length({text}) - length(regexp_replace({text}, '[.,;:!?]', ''))) / length({text}))"
    )


def duck_quality_blend(toks: str = DUCK_TOKENS, text: str = "text") -> str:
    """DuckDB dialect of the same blend, value-for-value identical."""
    en = _list_lit(LANG_STOPWORDS["en"])
    return (
        f"0.4 * least(len({toks}) / 100.0, 1.0)"
        f" + 0.4 * (len(list_filter({toks}, w -> list_contains({en}, w))) * 1.0 / len({toks}))"
        f" + 0.2 * (1.0 - (length({text}) - length(regexp_replace({text}, '[.,;:!?]', '', 'g'))) * 1.0 / length({text}))"
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token estimate.

    The regex mirrors byte-pair pre-tokenization coarsely: runs of
    letters, single digits, or single punctuation marks.
    """
    return spark.table("documents").selectExpr(
        "doc_id",
        f"size({TOKENS}) AS n_tokens",
        "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]', 0)) AS n_bpeish",
        "length(text) AS n_chars_measured",
    ).orderBy("doc_id")


TOKEN_COUNT_ORACLE = r"""
SELECT doc_id,
       len(string_split_regex(lower(trim(text)), '\s+'))                     AS n_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]'))       AS n_bpeish,
       length(text)                                                          AS n_chars_measured
FROM documents
ORDER BY doc_id
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features + a composite score.

    Features: char length, token count, mean token length, stopword
    ratio (English set), punctuation ratio. The composite is a fixed
    linear blend — deterministic, oracle-checkable.
    """
    stop = _array_lit(LANG_STOPWORDS["en"])
    return spark.table("documents").selectExpr(
        "doc_id",
        f"size({TOKENS}) AS n_tokens",
        f"round(length(text) / size({TOKENS}), 4) AS chars_per_token",
        f"round(size(filter({TOKENS}, w -> array_contains({stop}, w))) / size({TOKENS}), 4) AS stopword_ratio",
        "round((length(text) - length(regexp_replace(text, '[.,;:!?]', ''))) / length(text), 4) AS punct_ratio",
        f"round({quality_blend()}, 4) AS quality",
    ).orderBy("doc_id")


QUALITY_SCORE_ORACLE = r"""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(length(text) / len(toks), 4) AS chars_per_token,
       round(len(list_filter(toks, w -> list_contains({en}, w))) * 1.0 / len(toks), 4) AS stopword_ratio,
       round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0 / length(text), 4) AS punct_ratio,
       round({blend}, 4) AS quality
FROM t
ORDER BY doc_id
""".format(en=_list_lit(LANG_STOPWORDS["en"]), blend=duck_quality_blend(toks="toks"))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language ID: score = stopword hits per language,
    prediction = argmax with fixed precedence (en > de > es > fr > zh).
    """
    scores = {
        lang: f"size(filter({TOKENS}, w -> array_contains({_array_lit(ws)}, w)))"
        for lang, ws in LANG_STOPWORDS.items()
    }
    pred = f"""CASE
        WHEN {scores['en']} >= greatest({scores['de']}, {scores['es']}, {scores['fr']})
             AND {scores['en']} > 0 THEN 'en'
        WHEN {scores['de']} >= greatest({scores['es']}, {scores['fr']}) AND {scores['de']} > 0 THEN 'de'
        WHEN {scores['es']} >= {scores['fr']} AND {scores['es']} > 0 THEN 'es'
        WHEN {scores['fr']} > 0 THEN 'fr'
        ELSE 'und' END"""
    return spark.table("documents").selectExpr(
        "doc_id",
        "lang AS labeled_lang",
        *(f"{expr} AS score_{lang}" for lang, expr in scores.items()),
        f"{pred} AS pred_lang",
    ).orderBy("doc_id")


def _duck_score(lang: str) -> str:
    return (
        f"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        f"w -> list_contains({_list_lit(LANG_STOPWORDS[lang])}, w)))"
    )


LANG_ID_ORACLE = f"""
SELECT doc_id,
       lang AS labeled_lang,
       {_duck_score('en')} AS score_en,
       {_duck_score('de')} AS score_de,
       {_duck_score('es')} AS score_es,
       {_duck_score('fr')} AS score_fr,
       CASE
         WHEN {_duck_score('en')} >= greatest({_duck_score('de')}, {_duck_score('es')}, {_duck_score('fr')})
              AND {_duck_score('en')} > 0 THEN 'en'
         WHEN {_duck_score('de')} >= greatest({_duck_score('es')}, {_duck_score('fr')})
              AND {_duck_score('de')} > 0 THEN 'de'
         WHEN {_duck_score('es')} >= {_duck_score('fr')} AND {_duck_score('es')} > 0 THEN 'es'
         WHEN {_duck_score('fr')} > 0 THEN 'fr'
         ELSE 'und' END AS pred_lang
FROM documents
ORDER BY doc_id
"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash over tokens (Karp-Rabin style):
    ``h = fold(h*31 + v(token)) mod 1e9+7`` with
    ``v(w) = 131*length(w) + ascii(first char)``.

    Pure fold expression — order-dependent by construction, identical
    in any engine, no overflow (values stay < 2^63).
    """
    return spark.table("documents").selectExpr(
        "doc_id",
        f"""aggregate(
              transform({TOKENS}, w -> 131L * length(w) + ascii(substring(w, 1, 1))),
              0L,
              (acc, x) -> (acc * 31 + x) % 1000000007L
        ) AS fingerprint""",
    ).orderBy("doc_id")


FINGERPRINT_ORACLE = r"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split_regex(lower(trim(text)), '\s+'),
                          w -> 131::BIGINT * length(w) + ascii(substring(w, 1, 1)))),
         (acc, x) -> (acc * 31 + x) % 1000000007
       ) AS fingerprint
FROM documents
ORDER BY doc_id
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring: corpus unigram LM, then each
    document's mean token log-probability (higher = more typical text).

    Two-pass shape that scales: pass 1 aggregates token counts (shuffle
    on token); pass 2 joins tokens back to the vocabulary and averages
    per doc. The vocabulary join is left UNHINTED: the vocab relation
    grows with the corpus, so a forced broadcast would OOM at 100 TB —
    AQE picks broadcast when the measured size allows and falls back to
    a shuffled hash join when it doesn't (a min-frequency prune of the
    vocab is the other scale lever). The one-row ``total`` is safely
    broadcast. This is the standard cheap stand-in for model-based
    perplexity filtering in corpus pipelines.
    """
    toks = spark.table("documents").selectExpr(
        "doc_id", f"explode({TOKENS}) AS w"
    )
    vocab = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .selectExpr("doc_id", "ln(cnt / total) AS lp")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity proxy (the CCNet-style quality filter, one
    order up from :func:`unigram_logprob`): corpus bigram model with
    add-1 smoothing, each document scored by its mean conditional token
    log-probability ``ln((c(w1,w2) + 1) / (c(w1·) + V))``.

    Same two-pass scale shape as the unigram entry: the bigram and
    prefix counts shuffle once on their keys; the count joins back onto
    the bigram stream are left AQE-governed (the bigram vocabulary
    grows with the corpus — a forced broadcast would OOM at 100 TB);
    only the one-row vocabulary size is hint-broadcast. Smoothed
    probabilities are exact rationals of integers, so both engines
    compute bit-identical doubles before the ln.
    """
    toks = spark.table("documents").selectExpr("doc_id", f"{TOKENS} AS t")
    bigrams = toks.where("size(t) >= 2").selectExpr(
        "doc_id",
        "explode(transform(sequence(1, size(t) - 1), "
        "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))) AS b",
    ).select("doc_id", "b.w1", "b.w2")
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # c(w1·) = sum over w2 of c(w1,w2): roll the prefix counts up from
    # the already-aggregated (distinct-bigram-sized) c2 relation rather
    # than re-shuffling the token-scale bigram stream a second time.
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vsize = (
        toks.selectExpr("explode(t) AS w").agg(F.countDistinct("w").alias("v"))
    )
    scored = (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vsize))
        .selectExpr("doc_id", "ln((c2 + 1.0D) / (c1 + v)) AS lp")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


BIGRAM_LOGPROB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS t FROM documents
),
big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        FROM toks WHERE len(t) >= 2)
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, cast(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks))
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(ln((c2 + 1.0) / (c1 + v))), 4) AS avg_logprob
FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
GROUP BY doc_id
ORDER BY doc_id
"""


UNIGRAM_LOGPROB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS w FROM documents
),
vocab AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
total AS (SELECT sum(cnt) AS total FROM vocab)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(ln(cnt * 1.0 / total)), 4) AS avg_logprob
FROM toks JOIN vocab USING (w), total
GROUP BY doc_id
ORDER BY doc_id
"""


def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 quality
    rules, the deterministic subset): duplicate-token ratio, most-
    frequent-token fraction, and duplicate-bigram fraction. High values
    mark boilerplate/spam for corpus filtering.

    Everything is a row-local array expression (whole-stage codegen,
    zero shuffles — a map-only pass at any scale). The token array is
    projected ONCE before the signal expressions: the frequency scan
    references the array per distinct token, and an inlined
    ``split(...)`` there would re-tokenize the document
    O(distinct_tokens) times (the trap _shingle_arrays_df documents).
    The per-token frequency scan itself is O(tokens^2) per document but
    token counts are bounded per row, not per partition.
    """
    from golang_db_query_engine_elasticsearch_indexer_spark.functions import spark_ngrams

    total_bg = "greatest(size(toks) - 1, 0)"
    return (
        spark.table("documents")
        .selectExpr("doc_id", f"{TOKENS} AS toks")
        .selectExpr(
            "doc_id",
            "size(toks) AS n_tokens",
            "round(1.0 - size(array_distinct(toks)) / size(toks), 4) AS dup_token_ratio",
            """round(array_max(transform(array_distinct(toks),
                   d -> size(filter(toks, w -> w = d)))) / size(toks), 4)
                AS top_token_frac""",
            f"""round(CASE WHEN {total_bg} = 0 THEN 0.0
                      ELSE 1.0 - size({spark_ngrams(2, "toks")}) / {total_bg} END, 4)
                AS dup_bigram_frac""",
        )
        .orderBy("doc_id")
    )


REPETITION_ORACLE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 4) AS dup_token_ratio,
       round(list_max(list_transform(list_distinct(toks),
             d -> len(list_filter(toks, w -> w = d)))) * 1.0 / len(toks), 4) AS top_token_frac,
       round(CASE WHEN greatest(len(toks) - 1, 0) = 0 THEN 0.0
             ELSE 1.0 - len(list_distinct(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1]))) * 1.0 / greatest(len(toks) - 1, 0) END, 4)
         AS dup_bigram_frac
FROM t
ORDER BY doc_id
"""


def source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation rollup — the report a corpus pipeline cuts
    mixing decisions from: document count, token volume, mean quality
    composite, and exact-duplicate rate within the source.

    One groupBy on the (low-cardinality) source key; the quality and
    hash features are row-local, so the shuffle moves one row of
    partial aggregates per (partition, source).
    """
    per_doc = (
        spark.table("documents")
        .selectExpr("source", "text", f"{TOKENS} AS toks")
        .selectExpr(
            "source",
            "size(toks) AS n_tokens",
            "sha2(text, 256) AS h",
            f"{quality_blend(toks='toks')} AS quality",
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.round(
                1 - F.countDistinct("h") / F.count("*"), 4
            ).alias("exact_dup_rate"),
        )
        .orderBy("source")
    )


SOURCE_STATS_ORACLE = r"""
WITH t AS (
  SELECT source,
         string_split_regex(lower(trim(text)), '\s+') AS toks,
         sha256(text) AS h,
         text
  FROM documents
),
q AS (
  SELECT source, len(toks) AS n_tokens, h,
         {blend} AS quality
  FROM t
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality), 4) AS avg_quality,
       round(1 - count(DISTINCT h) * 1.0 / count(*), 4) AS exact_dup_rate
FROM q
GROUP BY source
ORDER BY source
""".format(blend=duck_quality_blend(toks="toks"))


QUALITY_KEEP_PCT = 0.8  # keep the top (1 - pct) quality slice per source


def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quality pruning: keep each source's top-quality slice
    (documents at or above the QUALITY_KEEP_PCT percent_rank within
    their source) — the "drop the bottom 80% per domain" cut corpus
    pipelines apply after scoring, expressed as a window so the
    threshold adapts per source instead of using one global constant.

    Determinism: quality is the shared ``quality_blend`` rounded to
    4 dp, and the percent_rank window orders on (quality, doc_id) — a
    total order — so the rank permutation and the kept set are
    cross-engine identical. Scale: one window shuffle partitioned by
    source (bounded partitions: per-source row counts are the corpus'
    own source distribution; a pathological mega-source would use the
    same salting levers as any skewed window).
    """
    return spark.sql(
        f"""
        WITH q AS (
          SELECT doc_id, source,
                 round({quality_blend()}, 4) AS quality
          FROM documents
        ),
        ranked AS (
          SELECT doc_id, source, quality,
                 round(percent_rank() OVER (
                   PARTITION BY source ORDER BY quality, doc_id), 6) AS pr
          FROM q
        )
        SELECT doc_id, source, quality, pr
        FROM ranked WHERE pr >= {QUALITY_KEEP_PCT}
        ORDER BY doc_id
        """
    )


QUALITY_PERCENTILE_ORACLE = r"""
WITH t AS (
  SELECT doc_id, source,
         string_split_regex(lower(trim(text)), '\s+') AS toks,
         text
  FROM documents
),
q AS (
  SELECT doc_id, source, round({blend}, 4) AS quality FROM t
),
ranked AS (
  SELECT doc_id, source, quality,
         round(percent_rank() OVER (
           PARTITION BY source ORDER BY quality, doc_id), 6) AS pr
  FROM q
)
SELECT doc_id, source, quality, pr
FROM ranked WHERE pr >= {pct}
ORDER BY doc_id
""".format(blend=duck_quality_blend(toks="toks"), pct=QUALITY_KEEP_PCT)


# --- PII detection / redaction --------------------------------------------
#
# The fixture documents are synthetic word-salad with NO natural PII, so
# a detector run on them alone would be a vacuous all-zeros pass. The
# operator therefore derives a raw text column IN-PLAN that appends
# deterministic fixture-keyed PII (an email, a phone number, an IPv4 —
# all functions of doc_id) to each document, then detects and redacts
# it. The planted column is the test harness; the detection/redaction
# expressions are the operator. Patterns are written in the regex
# subset Java (Spark) and RE2 (DuckDB) agree on: character classes,
# bounded repetition, \b word boundaries — no backreferences or
# lookaround.
#
# Everything is row-local regexp arithmetic (map-only, codegen'd): at
# 100 TB this is a single scan with zero shuffles, the same shape as
# the other text_* signals.

# (spark_literal, duck_literal) — Spark SQL string literals consume one
# level of backslash escaping; DuckDB literals do not.
_PII_PATTERNS = {
    "email": (
        r"[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
        r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    ),
    "phone": (
        r"\\+1-[0-9]{3}-[0-9]{4}",
        r"\+1-[0-9]{3}-[0-9]{4}",
    ),
    "ip": (
        r"\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    ),
}

#: deterministic planted-PII raw text — identical expression text in
#: both dialects (concat/lpad/cast/% all agree).
_PII_RAW = (
    "concat(text, ' contact user', cast(doc_id AS string), "
    "'@example.com or call +1-555-', "
    "lpad(cast(doc_id % 10000 AS string), 4, '0'), "
    "' from 10.', cast(doc_id % 200 AS string), '.0.', "
    "cast(doc_id % 250 AS string))"
)


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact PII (emails, phone numbers, IPv4 addresses):
    per-document match counts, the redacted text's fingerprint, and a
    residual count over the REDACTED text (0 = nothing leaked through,
    an in-plan proof the redaction chain is complete — the IP pattern
    must run before its digits are visible to nothing else, and the
    replacement tokens themselves must not re-match any pattern).
    """
    pats = {k: sp for k, (sp, _) in _PII_PATTERNS.items()}
    red = "raw"
    for kind, sp in pats.items():
        red = f"regexp_replace({red}, '{sp}', '<{kind.upper()}>')"
    residual = " + ".join(
        f"size(regexp_extract_all(redacted, '{sp}', 0))" for sp in pats.values()
    )
    return (
        spark.table("documents")
        .selectExpr("doc_id", f"{_PII_RAW} AS raw")
        .selectExpr(
            "doc_id",
            *(
                f"size(regexp_extract_all(raw, '{sp}', 0)) AS n_{kind}"
                for kind, sp in pats.items()
            ),
            f"{red} AS redacted",
        )
        .selectExpr(
            "doc_id",
            "n_email",
            "n_phone",
            "n_ip",
            f"({residual}) AS n_residual",
            "md5(redacted) AS redacted_fp",
        )
        .orderBy("doc_id")
    )


def _duck_pii_oracle() -> str:
    pats = {k: dk for k, (_, dk) in _PII_PATTERNS.items()}
    red = "raw"
    for kind, dp in pats.items():
        red = f"regexp_replace({red}, '{dp}', '<{kind.upper()}>', 'g')"
    residual = " + ".join(
        f"len(regexp_extract_all(redacted, '{dp}'))" for dp in pats.values()
    )
    counts = ",\n       ".join(
        f"len(regexp_extract_all(raw, '{dp}')) AS n_{kind}"
        for kind, dp in pats.items()
    )
    return f"""
WITH r AS (
  SELECT doc_id, {_PII_RAW} AS raw FROM documents
),
d AS (
  SELECT doc_id,
       {counts},
       {red} AS redacted
  FROM r
)
SELECT doc_id, n_email, n_phone, n_ip,
       ({residual}) AS n_residual,
       md5(redacted) AS redacted_fp
FROM d
ORDER BY doc_id
"""


def _kl_sql(tokens_expr: str) -> str:
    """Shared SQL for per-source KL divergence (one dialect knob: the
    tokenizer). All counts roll up from the (source, term) relation, so
    the token stream shuffles exactly once."""
    return f"""
        WITH toks AS (
          SELECT source, {{EXPLODE}} AS w FROM documents
        ),
        srcc AS (
          SELECT source, w, count(*) AS cs FROM toks GROUP BY source, w
        ),
        srct AS (
          SELECT source, cast(sum(cs) AS bigint) AS ns FROM srcc GROUP BY source
        ),
        gcounts AS (
          SELECT w, cast(sum(cs) AS bigint) AS c FROM srcc GROUP BY w
        ),
        tot AS (
          SELECT cast(sum(c) AS bigint) AS n FROM gcounts
        )
        SELECT s.source,
               t.ns AS n_tokens,
               count(*) AS n_terms,
               round(sum((s.cs * 1.0 / t.ns)
                         * ln((s.cs * 1.0 / t.ns) / (g.c * 1.0 / o.n))), 4)
                 AS kl_divergence
        FROM srcc s
        JOIN gcounts g ON s.w = g.w
        JOIN srct t ON s.source = t.source
        CROSS JOIN tot o
        GROUP BY s.source, t.ns
        ORDER BY s.source
    """.replace("{EXPLODE}", tokens_expr)


def source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    corpus distribution — the signal mixture tuning cuts source weights
    from (a source whose KL spikes is drifting off-distribution;
    KL >= 0 always, = 0 iff the source matches the corpus exactly).

    Scale shape: the token stream shuffles ONCE to the (source, term)
    counts, which are PINNED (eager localCheckpoint — Spark inlines
    CTEs, so the declarative form re-ran the token-scale explode+agg
    three times; plan-audited); per-source totals and the global term
    distribution both roll up from that already-aggregated relation
    (term-scale). The term join is AQE-governed (the vocabulary grows
    with the corpus); the per-source totals join is a #sources-row
    relation; the grand total is one broadcast row. KL terms are exact
    rationals of integers before the ln, and the per-source sum is
    rounded to 4 dp (6 dp showed 1-ulp summation-order flips), so both
    engines agree.
    """
    srcc = (
        spark.table("documents")
        .selectExpr("source", f"explode({TOKENS}) AS w")
        .groupBy("source", "w")
        .agg(F.count("*").alias("cs"))
        .localCheckpoint(eager=True)
    )
    srct = srcc.groupBy("source").agg(
        F.sum("cs").cast("bigint").alias("ns")
    )
    gcounts = srcc.groupBy("w").agg(F.sum("cs").cast("bigint").alias("c"))
    tot = gcounts.agg(F.sum("c").cast("bigint").alias("n"))
    return (
        srcc.join(gcounts, "w")
        .join(srct, "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "ns")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(
                F.sum(
                    F.expr("(cs * 1.0 / ns) * ln((cs * 1.0 / ns) / (c * 1.0 / n))")
                ),
                4,
            ).alias("kl_divergence"),
        )
        .selectExpr("source", "ns AS n_tokens", "n_terms", "kl_divergence")
        .orderBy("source")
    )


SOURCE_DIVERGENCE_ORACLE = _kl_sql(f"unnest({DUCK_TOKENS})").replace(
    "count(*) AS n_terms", "cast(count(*) AS bigint) AS n_terms"
)


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the
    fixture's labeled ``lang`` — the evaluation that tells a pipeline
    whether its cheap lang filter is safe to act on: one row per
    (labeled, predicted) pair with the count and the row-normalized
    recall share. Rolls up :func:`lang_id`'s own output, so the eval
    can never test a different predictor than the one deployed."""
    preds = lang_id(spark, sf_dir).select("labeled_lang", "pred_lang")
    return (
        preds.groupBy("labeled_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .selectExpr(
            "labeled_lang",
            "pred_lang",
            "n",
            "round(n / sum(n) OVER (PARTITION BY labeled_lang), 4) AS share",
        )
        .orderBy("labeled_lang", "pred_lang")
    )


LANG_CONFUSION_ORACLE = f"""
WITH preds AS ({LANG_ID_ORACLE})
SELECT labeled_lang, pred_lang, count(*) AS n,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY labeled_lang), 4)
         AS share
FROM preds
GROUP BY labeled_lang, pred_lang
ORDER BY labeled_lang, pred_lang
"""


def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source NEAR-duplication matrix: for every source pair, how
    many distinct SimHash fingerprints appear in both — the
    between-source contamination signal that tells a pipeline which
    "independent" sources are actually mirrors (within-source
    duplication is corpus_source_stats' exact_dup_rate; this is its
    pairwise complement). Identity is the 16-bit SimHash fingerprint
    rather than sha256: the fixture has NO cross-source exact
    duplicates, so a sha-keyed matrix would be a vacuous empty pass —
    fingerprint identity (simhash distance 0) is the near-dup
    granularity the signal actually wants, and it is non-empty at test
    scale. The join keys on the fingerprint over the (source,
    fingerprint)-distinct relation — documents never move, and fan-out
    per key is bounded by the source count."""
    from golang_db_query_engine_elasticsearch_indexer_spark.operators.dedup import (  # noqa: PLC0415
        _simhash_fps,
    )

    sh = (
        _simhash_fps(spark)
        .join(spark.table("documents").select("doc_id", "source"), "doc_id")
        .select("source", "simhash16")
        .distinct()
    )
    a = sh.selectExpr("simhash16 AS h", "source AS source_a")
    b = sh.selectExpr("simhash16 AS h", "source AS source_b")
    return (
        a.join(b, "h")
        .where("source_a < source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_fingerprints"))
        .orderBy("source_a", "source_b")
    )


def _source_overlap_oracle() -> str:
    from golang_db_query_engine_elasticsearch_indexer_spark.operators.dedup import (  # noqa: PLC0415
        _duck_simhash_fp_ctes,
    )

    return f"""
{_duck_simhash_fp_ctes()},
sh AS (
  SELECT DISTINCT d.source, f.f AS h
  FROM fp f JOIN documents d ON d.doc_id = f.doc_id
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS shared_fingerprints
FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""


def signal_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations between the engine's quality signals
    (composite quality blend, unigram-LM mean log-probability,
    duplicate-token ratio) — the signal-redundancy analysis a curation
    pipeline runs before stacking filters: two signals that correlate
    ~1 gate the same documents twice; a near-zero pair adds independent
    information.

    Scale: the per-doc signal relation reuses the unigram-LM shape (one
    token shuffle + AQE-governed vocab join); the correlation is one
    global aggregation (corr() partial-aggregates map-side). Rounded to
    3 dp — corr() divides large near-cancelling sums, so it carries
    more float summation-order noise than the 4-dp signals themselves.
    """
    # The correlated LM signal IS unigram_logprob's reported output
    # (the 4-dp avg_logprob column), so the redundancy analysis can
    # never measure a different definition than the deployed signal.
    lp = unigram_logprob(spark, sf_dir).select(
        "doc_id", F.col("avg_logprob").alias("avg_lp")
    )
    sig = (
        spark.table("documents")
        .selectExpr("doc_id", "text", f"{TOKENS} AS toks")
        .selectExpr(
            "doc_id",
            f"{quality_blend(toks='toks')} AS q",
            "1.0 - size(array_distinct(toks)) / size(toks) AS dup",
        )
        .join(lp, "doc_id")
    )
    return sig.selectExpr(
        "round(corr(q, avg_lp), 3) AS corr_quality_logprob",
        "round(corr(q, dup), 3) AS corr_quality_dup",
        "round(corr(avg_lp, dup), 3) AS corr_logprob_dup",
        "count(*) AS n_docs",
    )


SIGNAL_CORR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS w FROM documents
),
vocab AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
total AS (SELECT sum(cnt) AS total FROM vocab),
lp AS (
  SELECT doc_id, round(avg(ln(cnt * 1.0 / total)), 4) AS avg_lp
  FROM toks JOIN vocab USING (w), total
  GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id,
         {duck_quality_blend()} AS q,
         1.0 - len(list_distinct({DUCK_TOKENS})) * 1.0 / len({DUCK_TOKENS}) AS dup,
         lp.avg_lp
  FROM documents d JOIN lp ON lp.doc_id = d.doc_id
)
SELECT round(corr(q, avg_lp), 3) AS corr_quality_logprob,
       round(corr(q, dup), 3) AS corr_quality_dup,
       round(corr(avg_lp, dup), 3) AS corr_logprob_dup,
       cast(count(*) AS bigint) AS n_docs
FROM sig
"""


PMI_MIN_SUPPORT = 25
PMI_TOP_N = 50


def pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of term pairs by document
    co-occurrence — collocation mining (phrase/tokenizer induction's
    statistical core): pmi(x,y) = ln(df_xy * N / (df_x * df_y)) over
    document frequencies, reported for the top-{PMI_TOP_N} pairs at
    support >= {PMI_MIN_SUPPORT}.

    Scale shape: per-document pairs explode off the SORTED DISTINCT
    term array row-locally (fan-out is quadratic in per-doc distinct
    terms — the 100 TB lever is intersecting that array with a bounded
    candidate vocabulary, e.g. the top-K terms by document frequency,
    before pairing; the fixture vocabulary is 31 terms so the cap is
    moot here); document frequencies roll up from the distinct-term
    explode (one shuffle), pair frequencies from the pair stream (one
    shuffle), and the PMI join runs at vocabulary-pair scale. All
    probabilities are exact integer ratios; pmi is rounded to 4 dp and
    the (pmi DESC, x, y) cut is a total order.
    """
    dt = spark.table("documents").selectExpr(
        "doc_id", f"array_sort(array_distinct({TOKENS})) AS dt"
    )
    # Guard: Spark's sequence(1, size-1) with size=1 yields the
    # DESCENDING [1, 0] (not empty like DuckDB's range), which indexes
    # out of bounds / fabricates self-pairs for single-distinct-token
    # documents — same guard the minhash pair expansion applies.
    pairs = dt.where("size(dt) >= 2").selectExpr(
        "doc_id",
        """explode(flatten(transform(
             sequence(1, size(dt) - 1),
             i -> transform(sequence(0, i - 1),
                            j -> struct(dt[j] AS x, dt[i] AS y))
           ))) AS p""",
    ).select("p.x", "p.y")
    dfxy = pairs.groupBy("x", "y").agg(F.count("*").alias("df_xy"))
    dfx = (
        dt.selectExpr("explode(dt) AS w")
        .groupBy("w")
        .agg(F.count("*").alias("df"))
    )
    n = spark.table("documents").agg(F.count("*").alias("n"))
    return (
        dfxy.where(f"df_xy >= {PMI_MIN_SUPPORT}")
        .join(dfx.selectExpr("w AS x", "df AS df_x"), "x")
        .join(dfx.selectExpr("w AS y", "df AS df_y"), "y")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "x",
            "y",
            "df_xy",
            "df_x",
            "df_y",
            "round(ln(df_xy * 1.0 * n / (df_x * 1.0 * df_y)), 4) AS pmi",
        )
        .orderBy(F.desc("pmi"), "x", "y")
        .limit(PMI_TOP_N)
    )


PMI_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_sort(list_distinct({DUCK_TOKENS})) AS dt FROM documents
),
p1 AS (
  SELECT dt, unnest(range(2, len(dt) + 1)) AS i FROM t
),
pairs AS (
  SELECT dt[j] AS x, dt[i] AS y
  FROM (SELECT dt, i, unnest(range(1, i)) AS j FROM p1)
),
dfxy AS (
  SELECT x, y, cast(count(*) AS bigint) AS df_xy FROM pairs GROUP BY x, y
),
dfx AS (
  SELECT w, cast(count(*) AS bigint) AS df
  FROM (SELECT doc_id, unnest(dt) AS w FROM t) GROUP BY w
),
n AS (SELECT cast(count(*) AS bigint) AS n FROM documents)
SELECT p.x, p.y, p.df_xy, a.df AS df_x, b.df AS df_y,
       round(ln(p.df_xy * 1.0 * n.n / (a.df * 1.0 * b.df)), 4) AS pmi
FROM dfxy p
JOIN dfx a ON a.w = p.x
JOIN dfx b ON b.w = p.y
CROSS JOIN n
WHERE p.df_xy >= {PMI_MIN_SUPPORT}
ORDER BY pmi DESC, x, y
LIMIT {PMI_TOP_N}
"""


# --- compression-ratio quality signal --------------------------------------
#
# The DEFLATE-compressibility filter corpus recipes use alongside the
# repetition heuristics (highly compressible text is boilerplate/spam;
# near-incompressible text is often binary junk): ratio = deflated
# bytes / raw bytes. zlib is not expressible in SQL, so the raw
# deflated size has no cross-engine oracle — but (VERDICT r12 ask #3,
# the agg_approx_sketches pattern) the REGISTERED entry now emits a
# fully hash-checkable envelope instead of a rows-only row: the exact
# utf-8 byte tier (DuckDB: octet_length(encode(text))) plus in-plan
# invariant booleans computed from the live zlib values —
#   deflate_floor_ok:  n_deflated >= 8 (the minimal zlib stream:
#                      2-byte header + empty DEFLATE block + 4-byte
#                      adler32);
#   expansion_bounded: n_deflated <= n_bytes + n_bytes/1000 + 64
#                      (zlib's documented worst case is a ~0.1%
#                      overhead + constant; 64 absorbs the per-block
#                      5-byte stored-block headers at any doc size);
#   ratio_consistent:  ratio == round(n_deflated / max(n_bytes,1), 4)
#                      (the envelope recomputes the published
#                      derivation — a future edit that breaks it
#                      fails the driver hash, not just a unit test).
# The oracle predicts every boolean TRUE, so the driver hash gate
# verifies the exact tier and that zlib's outputs sit inside their
# documented bounds. The full per-document ratio remains available
# via compression_ratio() for pipelines. The Spark-side plumbing is
# the real thing: Arrow-batched ``mapInPandas`` with a fixed
# compression level, vectorized per batch — the same hot-path
# discipline as the multimodal decoders (never a row-at-a-time
# Python UDF).
ZLIB_LEVEL = 6

COMPRESSION_ENVELOPE_ORACLE = """
SELECT doc_id,
       cast(octet_length(encode(text)) AS integer) AS n_bytes,
       TRUE AS deflate_floor_ok,
       TRUE AS expansion_bounded,
       TRUE AS ratio_consistent
FROM documents
ORDER BY doc_id
"""


def compression_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-checkable compression entry: exact byte counts +
    zlib-bound invariant booleans (see the block comment above)."""
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", IntegerType()),
            StructField("deflate_floor_ok", BooleanType()),
            StructField("expansion_bounded", BooleanType()),
            StructField("ratio_consistent", BooleanType()),
        ]
    )

    def _batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            raw = [t.encode("utf-8") for t in pdf["text"]]
            n = [len(b) for b in raw]
            nd = [len(zlib.compress(b, ZLIB_LEVEL)) for b in raw]
            ratio = [round(d / max(b, 1), 4) for d, b in zip(nd, n)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "deflate_floor_ok": [d >= 8 for d in nd],
                    "expansion_bounded": [
                        d <= b + b // 1000 + 64 for d, b in zip(nd, n)
                    ],
                    "ratio_consistent": [
                        r == round(d / max(b, 1), 4)
                        for r, d, b in zip(ratio, nd, n)
                    ],
                }
            )

    return (
        spark.table("documents")
        .select("doc_id", "text")
        .mapInPandas(_batches, schema)
        .orderBy("doc_id")
    )


def compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DEFLATE compression ratio (zlib level 6)."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", IntegerType()),
            StructField("n_deflated", IntegerType()),
            StructField("ratio", DoubleType()),
        ]
    )

    def _batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            raw = [t.encode("utf-8") for t in pdf["text"]]
            n = [len(b) for b in raw]
            nd = [len(zlib.compress(b, ZLIB_LEVEL)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "n_deflated": nd,
                    "ratio": [round(d / max(b, 1), 4) for d, b in zip(nd, n)],
                }
            )

    return (
        spark.table("documents")
        .select("doc_id", "text")
        .mapInPandas(_batches, schema)
        .orderBy("doc_id")
    )


# --- linear quality classifier ---------------------------------------------
#
# The scoring plumbing of a model-based quality filter (the
# fasttext-style classifier corpus pipelines run after heuristics):
# a logistic model over the engine's own deterministic text features,
# with FIXED published weights standing in for trained ones — at
# deploy time a trained model is exactly this: constants in the score
# expression. Everything is row-local codegen'd arithmetic; the
# sigmoid's exp() runs on identical doubles in both engines and the
# score is rounded to 4 dp before both output and threshold (the
# rounding-boundary discipline _verify_jaccard documents) so the kept
# set cannot diverge cross-engine.
QC_WEIGHTS = {
    "length_sat": 1.6,       # saturating token-count signal
    "stopword_ratio": 2.4,   # natural-language prior
    "punct_ratio": -3.0,     # symbol soup penalty
    "dup_token_ratio": -2.2, # boilerplate/repetition penalty
}
# Bias calibrated to the fixture's score distribution (raw-z median is
# -0.09 with IQR [-0.19, 0.02]) so the decision boundary lands INSIDE
# the distribution — both keep and drop classes are populated at test
# scale and the threshold comparison is non-vacuous.
QC_BIAS = 0.1
QC_THRESHOLD = 0.5


def qc_score_spark() -> str:
    """Spark rendering of THE logistic score (rounded to 4 dp) over a
    ``(doc_id, text, toks)`` relation — the single definition every
    classifier consumer (scoring entry, calibration) shares, mirroring
    the quality_blend discipline."""
    z = (
        f"{QC_BIAS}"
        f" + {QC_WEIGHTS['length_sat']} * least(size(toks) / 100.0, 1.0)"
        f" + {QC_WEIGHTS['stopword_ratio']} * (size(filter(toks, w -> array_contains({_array_lit(LANG_STOPWORDS['en'])}, w))) / size(toks))"
        f" + {QC_WEIGHTS['punct_ratio']} * ((length(text) - length(regexp_replace(text, '[.,;:!?]', ''))) / length(text))"
        f" + {QC_WEIGHTS['dup_token_ratio']} * (1.0 - size(array_distinct(toks)) / size(toks))"
    )
    return f"round(1.0 / (1.0 + exp(-({z}))), 4)"


def qc_score_duck() -> str:
    """DuckDB rendering of the same score, value-for-value identical."""
    z = (
        f"{QC_BIAS}"
        f" + {QC_WEIGHTS['length_sat']} * least(len(toks) / 100.0, 1.0)"
        f" + {QC_WEIGHTS['stopword_ratio']} * (len(list_filter(toks, w -> list_contains({_list_lit(LANG_STOPWORDS['en'])}, w))) * 1.0 / len(toks))"
        f" + {QC_WEIGHTS['punct_ratio']} * ((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0 / length(text))"
        f" + {QC_WEIGHTS['dup_token_ratio']} * (1.0 - len(list_distinct(toks)) * 1.0 / len(toks))"
    )
    return f"round(1.0 / (1.0 + exp(-({z}))), 4)"


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic quality score + keep/drop decision per document."""
    return (
        spark.table("documents")
        .selectExpr("doc_id", "text", f"{TOKENS} AS toks")
        .selectExpr("doc_id", f"{qc_score_spark()} AS p_keep")
        .selectExpr("doc_id", "p_keep", f"p_keep >= {QC_THRESHOLD} AS keep")
        .orderBy("doc_id")
    )


QUALITY_CLASSIFIER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {DUCK_TOKENS} AS toks FROM documents
),
s AS (
  SELECT doc_id, {qc_score_duck()} AS p_keep
  FROM t
)
SELECT doc_id, p_keep, p_keep >= {QC_THRESHOLD} AS keep
FROM s
ORDER BY doc_id
"""


# --- classifier TRAINING as one declarative query ---------------------------
#
# The other half of quality_classifier's loop: the fixed QC_WEIGHTS
# deploy a model, this entry TRAINS one — full-batch gradient descent
# on logistic loss over the same four features, predicting curated-
# source membership. The whole optimization is ONE query: iterations
# chain as CTE pairs (gradient aggregate -> weight update), the same
# literal-only iteration shape as the BPE merge loop and PageRank.
# Determinism discipline: features round to 4 dp in the shared feats
# relation (so both engines descend from identical inputs), each
# gradient component and updated weight rounds to 9 dp per iteration
# (absorbing summation-order and libm-ulp drift before it compounds —
# the PageRank rule), and the loss reports at 6 dp.
GD_ITERS = 5
GD_LR = 1.0
_GD_LABEL = "source IN ('src0', 'src1', 'src2', 'src3')"


def _gd_iterations_sql(feats_cte: str) -> str:
    """Chained-CTE GD over a ``feats`` CTE with columns (y, x1..x4) —
    the ORACLE formulation (DuckDB materializes CTEs; Spark would
    inline this chain exponentially, so the engine runs the
    driver-looped form in :func:`classifier_train`)."""
    z = "(b + w1 * x1 + w2 * x2 + w3 * x3 + w4 * x4)"
    sig = f"(1.0 / (1.0 + exp(-{z})))"
    parts = [
        f"feats AS ({feats_cte})",
        "w0 AS (SELECT cast(0.0 AS double) AS b, cast(0.0 AS double) AS w1,"
        " cast(0.0 AS double) AS w2, cast(0.0 AS double) AS w3,"
        " cast(0.0 AS double) AS w4)",
    ]
    for r in range(1, GD_ITERS + 1):
        parts.append(
            f"""g{r} AS (
  SELECT round(avg({sig} - y), 9) AS gb,
         round(avg(({sig} - y) * x1), 9) AS g1,
         round(avg(({sig} - y) * x2), 9) AS g2,
         round(avg(({sig} - y) * x3), 9) AS g3,
         round(avg(({sig} - y) * x4), 9) AS g4,
         round(avg(-(y * ln({sig}) + (1.0 - y) * ln(1.0 - {sig}))), 6)
           AS logloss
  FROM feats CROSS JOIN w{r - 1})"""
        )
        parts.append(
            f"""w{r} AS (
  SELECT round(b - {GD_LR} * gb, 9) AS b,
         round(w1 - {GD_LR} * g1, 9) AS w1,
         round(w2 - {GD_LR} * g2, 9) AS w2,
         round(w3 - {GD_LR} * g3, 9) AS w3,
         round(w4 - {GD_LR} * g4, 9) AS w4
  FROM w{r - 1} CROSS JOIN g{r})"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT cast({r} AS INTEGER) AS iter, g{r}.logloss,"
        f" w{r}.b, w{r}.w1, w{r}.w2, w{r}.w3, w{r}.w4"
        f" FROM w{r} CROSS JOIN g{r}"
        for r in range(1, GD_ITERS + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\n{union}\nORDER BY iter"


_GD_FEATS_SPARK = f"""
  SELECT cast(CASE WHEN {_GD_LABEL} THEN 1 ELSE 0 END AS double) AS y,
         round(least(size(toks) / 100.0, 1.0), 4) AS x1,
         round(size(filter(toks, w -> array_contains({{stop}}, w)))
               / size(toks), 4) AS x2,
         round((length(text) - length(regexp_replace(text, '[.,;:!?]', '')))
               / length(text), 4) AS x3,
         round(1.0 - size(array_distinct(toks)) / size(toks), 4) AS x4
  FROM (SELECT source, text, {TOKENS} AS toks FROM documents)
"""

_GD_FEATS_DUCK = f"""
  SELECT cast(CASE WHEN {_GD_LABEL} THEN 1 ELSE 0 END AS double) AS y,
         round(least(len(toks) / 100.0, 1.0), 4) AS x1,
         round(len(list_filter(toks, w -> list_contains({{stop}}, w)))
               * 1.0 / len(toks), 4) AS x2,
         round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
               * 1.0 / length(text), 4) AS x3,
         round(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 4) AS x4
  FROM (SELECT source, text, {DUCK_TOKENS} AS toks FROM documents)
"""


def _round_half_up(v: float, places: int) -> float:
    """Decimal HALF_UP rounding of a double's shortest repr — matches
    both engines' SQL ``round`` on these magnitudes (pinned by the
    differential and the Python-GD recompute test)."""
    from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

    return float(Decimal(repr(v)).quantize(Decimal(f"1e-{places}"), ROUND_HALF_UP))


def classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic quality/provenance classifier by full-batch GD:
    per-iteration rows (iter, logloss-before-step, updated weights).

    Scale shape — the MLlib driver-loop shape: the feature relation is
    persisted ONCE; each iteration is one partial-aggregated scan of
    that cache (gradients are averages — map-side combinable) whose
    1-row result is collected, the weight vector lives on the driver,
    and the next iteration's expression embeds the weights as literals
    (repr() round-trips doubles bit-exactly). A fully chained
    single-query form was measured to inline the CTE chain
    exponentially (2^K scans — see bpe_merge_learn); the oracle keeps
    that chained formulation (DuckDB materializes CTEs), so the
    differential also pins loop-vs-chain equivalence. A trained model
    deploys by pasting the final weight row into the constant-weight
    scoring expression (quality_classifier)."""
    feats = spark.sql(
        _GD_FEATS_SPARK.format(stop=_array_lit(LANG_STOPWORDS["en"]))
    ).persist()
    w = [0.0] * 5  # b, w1..w4
    out: list[tuple] = []
    try:
        for it in range(1, GD_ITERS + 1):
            z = (
                f"({w[0]!r} + {w[1]!r} * x1 + {w[2]!r} * x2"
                f" + {w[3]!r} * x3 + {w[4]!r} * x4)"
            )
            sig = f"(1.0 / (1.0 + exp(-{z})))"
            g = feats.selectExpr(
                f"round(avg({sig} - y), 9) AS gb",
                f"round(avg(({sig} - y) * x1), 9) AS g1",
                f"round(avg(({sig} - y) * x2), 9) AS g2",
                f"round(avg(({sig} - y) * x3), 9) AS g3",
                f"round(avg(({sig} - y) * x4), 9) AS g4",
                f"round(avg(-(y * ln({sig}) + (1.0 - y) * ln(1.0 - {sig}))), 6)"
                " AS logloss",
            ).collect()[0]
            w = [
                _round_half_up(wk - GD_LR * gk, 9)
                for wk, gk in zip(w, (g.gb, g.g1, g.g2, g.g3, g.g4))
            ]
            out.append((it, g.logloss, *w))
    finally:
        feats.unpersist()
    return spark.createDataFrame(
        out,
        "iter int, logloss double, b double, w1 double, w2 double,"
        " w3 double, w4 double",
    ).orderBy("iter")


CLASSIFIER_TRAIN_ORACLE = _gd_iterations_sql(
    _GD_FEATS_DUCK.format(stop=_list_lit(LANG_STOPWORDS["en"]))
)


def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration of the logistic quality classifier against
    the heuristic quality blend: documents are cut into p_keep deciles
    (ntile with doc_id tiebreak — deterministic) and each decile
    reports its mean classifier score and mean blend. A monotone
    mean-blend column across deciles says the classifier orders
    documents the same way the heuristics do; a flat one says it adds
    nothing — the calibration check run before swapping a model filter
    in for heuristics. One map-only scoring pass + one ntile window +
    one 10-row aggregation."""
    scored = spark.sql(
        f"""
        SELECT doc_id,
               {qc_score_spark()} AS p_keep,
               round({quality_blend(toks='toks')}, 4) AS blend
        FROM (SELECT doc_id, text, {TOKENS} AS toks FROM documents)
        """
    )
    return (
        scored.selectExpr(
            "doc_id", "p_keep", "blend",
            "ntile(10) OVER (ORDER BY p_keep, doc_id) AS decile",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("p_keep"), 4).alias("mean_p_keep"),
            F.round(F.avg("blend"), 4).alias("mean_blend"),
        )
        .orderBy("decile")
    )


CALIBRATION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {DUCK_TOKENS} AS toks FROM documents
),
scored AS (
  SELECT doc_id,
         {qc_score_duck()} AS p_keep,
         round({duck_quality_blend(toks="toks")}, 4) AS blend
  FROM t
),
cut AS (
  SELECT p_keep, blend,
         ntile(10) OVER (ORDER BY p_keep, doc_id) AS decile
  FROM scored
)
SELECT decile, cast(count(*) AS bigint) AS n_docs,
       round(avg(p_keep), 4) AS mean_p_keep,
       round(avg(blend), 4) AS mean_blend
FROM cut
GROUP BY decile
ORDER BY decile
"""

def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus term distribution: OLS slope and
    intercept of ln(freq) against ln(rank) — natural text sits near
    slope -1, and a corpus whose slope drifts (much flatter: synthetic/
    templated text; much steeper: heavy boilerplate head) fails the
    distributional sniff test. Rank is the (freq DESC, term) total
    order, regression is one regr_slope/regr_intercept aggregation over
    the VOCABULARY-scale relation; rounded to 3 dp (regression sums
    carry more float noise than the underlying counts).
    """
    return spark.sql(
        f"""
        WITH vocab AS (
          SELECT w, count(*) AS freq
          FROM (SELECT explode({TOKENS}) AS w FROM documents)
          GROUP BY w
        ),
        ranked AS (
          SELECT freq,
                 row_number() OVER (ORDER BY freq DESC, w) AS rank
          FROM vocab
        )
        SELECT cast(count(*) AS bigint) AS n_terms,
               round(regr_slope(ln(freq), ln(rank)), 3) AS zipf_slope,
               round(regr_intercept(ln(freq), ln(rank)), 3) AS zipf_intercept
        FROM ranked
        """
    )


ZIPF_ORACLE = f"""
WITH vocab AS (
  SELECT w, count(*) AS freq
  FROM (SELECT unnest({DUCK_TOKENS}) AS w FROM documents)
  GROUP BY w
),
ranked AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, w) AS rank
  FROM vocab
)
SELECT cast(count(*) AS bigint) AS n_terms,
       round(regr_slope(ln(freq), ln(rank)), 3) AS zipf_slope,
       round(regr_intercept(ln(freq), ln(rank)), 3) AS zipf_intercept
FROM ranked
"""


BPE_TOP_N = 50


def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge-step statistics (Sennrich et al. 2016): corpus
    frequency of each adjacent character pair, weighted by word
    frequency — the top row of this result IS the tokenizer's first
    merge rule, and re-running the op over merged symbols iterates the
    induction.

    Scale shape: the token stream collapses to the (distinct word,
    count) vocabulary FIRST (one shuffle on the word key, map-side
    combined — the relation drops from corpus-token scale to
    vocabulary scale, which grows sub-linearly in the corpus), and
    character pairs explode off the *vocabulary*, never the raw token
    stream; the final pair aggregation shuffles a vocabulary-sized
    relation with ~word-length fan-out. At 100 TB the heavy shuffle is
    the word count — exactly the word-count job — and everything after
    is vocabulary-sized.

    Output: top-{BPE_TOP_N} pairs by weighted frequency with the
    number of distinct word types containing each pair; (freq DESC,
    pair) is a total order, so the cut is deterministic.
    """
    vocab = (
        spark.table("documents")
        .selectExpr(f"explode({TOKENS}) AS w")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = vocab.where("length(w) >= 2").selectExpr(
        "w",
        "cnt",
        "explode(transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))) AS pair",
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("cnt").alias("freq"),
            F.countDistinct("w").alias("n_word_types"),
        )
        .orderBy(F.desc("freq"), "pair")
        .limit(BPE_TOP_N)
    )


BPE_PAIR_STATS_ORACLE = f"""
WITH vocab AS (
  SELECT w, count(*) AS cnt
  FROM (SELECT unnest({DUCK_TOKENS}) AS w FROM documents)
  GROUP BY w
),
p AS (
  SELECT w, cnt, substring(w, i, 2) AS pair
  FROM (SELECT w, cnt, unnest(range(1, length(w))) AS i
        FROM vocab WHERE length(w) >= 2)
)
SELECT pair,
       cast(sum(cnt) AS BIGINT) AS freq,
       count(DISTINCT w) AS n_word_types
FROM p
GROUP BY pair
ORDER BY freq DESC, pair
LIMIT {BPE_TOP_N}
"""


BPE_MERGES = 6


def _bpe_merge_sql(
    vocab_src: str,
    spaced_expr: str,
    pairs_from: str,
) -> str:
    """Chained-CTE SQL for the full BPE merge LOOP (dialect knobs:
    vocab source subquery, char-spacing regexp, pair-index explosion).
    One ``b{r}``/``v{r}`` CTE pair per merge round. Used as the DuckDB
    ORACLE formulation (DuckDB materializes each CTE once); the Spark
    engine runs the equivalent driver-looped form — see
    :func:`bpe_merge_learn` for why the chained form is NOT the Spark
    shape (exponential CTE inlining).

    Symbol strings use a TWO-space separator with ONE-space padding
    (`` a  b  c ``) so plain ``replace`` is an exact whole-symbol
    merge: the pattern `` x  y `` can never match across a symbol
    boundary (symbols contain no spaces), and each replacement
    consumes the OUTER halves of its neighbors' double separators,
    leaving single spaces that re-pair with the replacement's own
    padding — adjacent occurrences (``a a a a`` under merge ``a+a``)
    therefore chain exactly like the reference greedy left-to-right
    scan (Sennrich et al. 2016), which both engines' non-overlapping
    ``replace`` implements."""
    parts = [f"v0 AS (SELECT {spaced_expr} AS w, cnt FROM ({vocab_src}))"]
    for r in range(1, BPE_MERGES + 1):
        parts.append(f"p{r} AS ({pairs_from.format(prev=f'v{r - 1}')})")
        parts.append(
            f"""b{r} AS (
  SELECT lsym, rsym, pattern, repl, freq, {r} AS merge_rank FROM (
    SELECT lsym, rsym, pattern, repl,
           cast(sum(cnt) AS BIGINT) AS freq
    FROM p{r} GROUP BY lsym, rsym, pattern, repl)
  ORDER BY freq DESC, pattern LIMIT 1)"""
        )
        parts.append(
            f"v{r} AS (SELECT replace(v.w, b.pattern, b.repl) AS w, cnt"
            f" FROM v{r - 1} v CROSS JOIN b{r} b)"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, lsym, rsym, lsym || rsym AS merged, freq FROM b{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\n{union}\nORDER BY merge_rank"


# Spark dialect knobs ------------------------------------------------
_BPE_VOCAB_SPARK = f"""
SELECT word, cast(count(*) AS BIGINT) AS cnt
FROM (SELECT explode({TOKENS}) AS word FROM documents)
GROUP BY word
"""
_BPE_SPACED_SPARK = (
    "concat(' ', trim(regexp_replace(word, '(.)', '$1  ')), ' ')"
)
_BPE_PAIRS_SPARK = """
SELECT cnt, pr.lsym, pr.rsym, pr.pattern, pr.repl
FROM (SELECT cnt, split(trim(w), '  ') AS s FROM {prev})
LATERAL VIEW explode(transform(sequence(1, size(s) - 1), i -> struct(
    element_at(s, i) AS lsym,
    element_at(s, i + 1) AS rsym,
    concat(' ', element_at(s, i), '  ', element_at(s, i + 1), ' ') AS pattern,
    concat(' ', element_at(s, i), element_at(s, i + 1), ' ') AS repl))) t AS pr
WHERE size(s) >= 2
"""

# DuckDB dialect knobs -----------------------------------------------
_BPE_VOCAB_DUCK = f"""
SELECT word, cast(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
GROUP BY word
"""
_BPE_SPACED_DUCK = (
    "' ' || trim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' '"
)
_BPE_PAIRS_DUCK = """
SELECT cnt,
       s[i] AS lsym, s[i + 1] AS rsym,
       ' ' || s[i] || '  ' || s[i + 1] || ' ' AS pattern,
       ' ' || s[i] || s[i + 1] || ' ' AS repl
FROM (SELECT cnt, s, unnest(range(1, len(s))) AS i
      FROM (SELECT cnt, string_split(trim(w), '  ') AS s FROM {prev})
      WHERE len(s) >= 2)
"""


def bpe_merge_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {BPE_MERGES} BPE merge rules — the actual
    tokenizer-training induction, not just the first-step statistics
    (:func:`bpe_pair_stats`): each round counts adjacent symbol pairs
    over the vocabulary weighted by word frequency, picks the argmax
    (freq DESC, pattern tiebreak), rewrites every word, and repeats.

    Scale shape: identical to the HF-tokenizers trainer — the ONLY
    corpus-scale work is the word-count shuffle building the spaced
    vocabulary, which is persisted ONCE; each merge round is one
    vocabulary-sized aggregation (map-side combined) + a 1-row argmax
    collect, and the rewrite materializes per round so round r+1 reads
    round r's cache, never its lineage. A fully chained single-query
    form was measured to inline the CTE chain EXPONENTIALLY (2^K - 1
    corpus scans at K merges — Spark inlines multiply-referenced
    CTEs), so the driver-resident argmax with per-round persist is the
    shape that survives production merge counts; the DuckDB oracle
    keeps the chained-CTE formulation (DuckDB materializes CTEs), so
    the differential also pins loop-vs-chain equivalence.
    """
    vocab = spark.sql(
        f"SELECT {_BPE_SPACED_SPARK} AS w, cnt FROM ({_BPE_VOCAB_SPARK})"
    ).persist()
    held = [vocab]
    cur = vocab
    out: list[tuple] = []
    try:
        for r in range(1, BPE_MERGES + 1):
            cur.createOrReplaceTempView("__bpe_cur")
            best = (
                spark.sql(
                    "SELECT lsym, rsym, pattern, repl,"
                    " cast(sum(cnt) AS BIGINT) AS freq FROM ("
                    + _BPE_PAIRS_SPARK.format(prev="__bpe_cur")
                    + ") GROUP BY lsym, rsym, pattern, repl"
                    " ORDER BY freq DESC, pattern LIMIT 1"
                )
            ).collect()[0]
            out.append(
                (r, best.lsym, best.rsym, best.lsym + best.rsym, best.freq)
            )
            if r == BPE_MERGES:
                # the last argmax is collected above; rewriting the
                # vocabulary once more would be a job whose output
                # nothing reads (guide §1.2: don't compute things you
                # throw away)
                break
            nxt = cur.select(
                F.call_function(
                    "replace",
                    F.col("w"),
                    F.lit(best.pattern),
                    F.lit(best.repl),
                ).alias("w"),
                "cnt",
            ).persist()
            # No count() here: round r+1's argmax is the next action and
            # it materializes this cache in the same pass (one job per
            # round instead of two); the rewrite reads round r's cache,
            # never its lineage, exactly as before.
            held.append(nxt)
            cur = nxt
    finally:
        for d in held:
            d.unpersist()
        spark.catalog.dropTempView("__bpe_cur")
    return spark.createDataFrame(
        out, "merge_rank int, lsym string, rsym string, merged string, freq bigint"
    ).orderBy("merge_rank")


BPE_MERGE_LEARN_ORACLE = _bpe_merge_sql(
    _BPE_VOCAB_DUCK, _BPE_SPACED_DUCK, _BPE_PAIRS_DUCK
)


# --- Python UDTF seam -------------------------------------------------------
#
# The table-function half of the UDF seam (the scalar/grouped halves
# are the Arrow-batched pandas paths in multimodal/streaming): a
# Python UDTF exploding each document into word bigrams, consumed via
# SQL LATERAL and aggregated JVM-side. Arrow-optimized
# (``useArrow=True``) — rows stream through Arrow batches, not
# pickled one at a time. The oracle recomputes the bigrams with
# DuckDB list arithmetic, so the UDTF's row expansion itself is
# hash-verified. This is a SEAM DEMO: for pure bigram counting the
# built-in transform/sequence expression (text_bigram_logprob) is the
# faster all-JVM path — a UDTF earns its place when the per-row
# expansion needs real Python (tokenizers, parsers, model calls).
BIGRAM_UDTF_TOP_N = 50


def _make_bigram_udtf():
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="gram string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):  # noqa: ANN001
            import re  # noqa: PLC0415

            # Mirror the SQL tokenizer (functions.TOKENS) exactly:
            # trim() strips ASCII SPACE only (not Unicode whitespace,
            # not tabs), and Java's \s is the ASCII class
            # [ \t\n\x0b\f\r] — Python's .strip()/\s are Unicode-aware
            # and would diverge on tab/NBSP-framed documents.
            toks = (
                re.split(r"[ \t\n\x0b\f\r]+", text.strip(" ").lower())
                if text
                else []
            )
            for i in range(len(toks) - 1):
                yield (toks[i] + " " + toks[i + 1],)

    return Bigrams


def bigrams_udtf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigrams via the Python-UDTF lateral expansion.

    Scale shape: the UDTF is a map-side row expander (Arrow-batched,
    partition-parallel, no shuffle of its own); the count aggregation
    and top-N cut stay JVM-side. Registration is idempotent per
    session."""
    spark.udtf.register("bigrams_udtf", _make_bigram_udtf())
    return spark.sql(
        f"""
        SELECT g.gram, count(*) AS n
        FROM documents, LATERAL bigrams_udtf(text) g
        GROUP BY g.gram
        ORDER BY n DESC, gram
        LIMIT {BIGRAM_UDTF_TOP_N}
        """
    )


BIGRAMS_UDTF_ORACLE = f"""
WITH t AS (
  SELECT {DUCK_TOKENS} AS toks FROM documents
),
b AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS gram
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t
        WHERE len(toks) >= 2)
)
SELECT gram, count(*) AS n
FROM b GROUP BY gram
ORDER BY n DESC, gram
LIMIT {BIGRAM_UDTF_TOP_N}
"""


NOVELTY_N = 3
NOVELTY_BUCKETS = 10


def novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: docs in doc_id order split into ten
    buckets; per bucket, the fraction of its distinct word trigrams
    making their FIRST corpus appearance there — the
    diminishing-returns measurement behind "is more of this source
    still adding new content". Bucket 1 is 1.0 by construction; the
    curve's decay rate is the signal.

    Scale shape: grams travel as md5 hashes (32-byte keys, text never
    shuffles); first-appearance is one min() aggregation on the gram
    hash; presence is one distinct count keyed (bucket, gram). The
    ntile bucket window suits the fixture's single doc-id range — at
    corpus scale the bucket is a pure function of the ingest partition
    (date/shard), making assignment map-only.
    """
    from golang_db_query_engine_elasticsearch_indexer_spark.functions import (  # noqa: PLC0415
        spark_ngrams,
    )

    grams = spark.table("documents").selectExpr(
        "doc_id",
        f"explode({spark_ngrams(NOVELTY_N, TOKENS)}) AS gram",
    ).selectExpr("doc_id", "md5(gram) AS g")
    buckets = spark.table("documents").selectExpr(
        "doc_id",
        f"cast(ntile({NOVELTY_BUCKETS}) OVER (ORDER BY doc_id) AS int) AS bucket",
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    present = (
        grams.join(buckets, "doc_id")
        .groupBy("bucket")
        .agg(F.countDistinct("g").alias("n_grams_present"))
    )
    intro = (
        first.join(buckets.selectExpr("doc_id AS first_doc", "bucket"), "first_doc")
        .groupBy("bucket")
        .agg(F.count("*").alias("n_grams_introduced"))
    )
    return (
        present.join(intro, "bucket")
        .selectExpr(
            "bucket",
            "n_grams_present",
            "n_grams_introduced",
            "round(n_grams_introduced * cast(1 AS double) / n_grams_present, 6)"
            " AS novelty",
        )
        .orderBy("bucket")
    )


def _novelty_oracle() -> str:
    from golang_db_query_engine_elasticsearch_indexer_spark.functions import (  # noqa: PLC0415
        duck_ngrams,
    )

    return f"""
WITH grams AS (
  SELECT doc_id, md5(g) AS g
  FROM (SELECT doc_id, unnest({duck_ngrams(NOVELTY_N, DUCK_TOKENS)}) AS g
        FROM documents) x
),
buckets AS (
  SELECT doc_id,
         cast(ntile({NOVELTY_BUCKETS}) OVER (ORDER BY doc_id) AS int) AS bucket
  FROM documents
),
firsts AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g),
present AS (
  SELECT b.bucket, count(DISTINCT gr.g) AS n_grams_present
  FROM grams gr JOIN buckets b ON gr.doc_id = b.doc_id GROUP BY b.bucket
),
intro AS (
  SELECT b.bucket, count(*) AS n_grams_introduced
  FROM firsts f JOIN buckets b ON f.first_doc = b.doc_id GROUP BY b.bucket
)
SELECT p.bucket,
       cast(p.n_grams_present AS bigint) AS n_grams_present,
       cast(i.n_grams_introduced AS bigint) AS n_grams_introduced,
       round(i.n_grams_introduced * cast(1 AS double) / p.n_grams_present, 6)
         AS novelty
FROM present p JOIN intro i ON p.bucket = i.bucket
ORDER BY p.bucket
"""


def registry() -> dict[str, dict]:
    return {
        "text_token_count": {"fn": token_count, "oracle": TOKEN_COUNT_ORACLE},
        "tokens_bpe_pair_stats": {"fn": bpe_pair_stats, "oracle": BPE_PAIR_STATS_ORACLE},
        "tokens_bpe_merge_learn": {
            "fn": bpe_merge_learn,
            "oracle": BPE_MERGE_LEARN_ORACLE,
        },
        "docs_quality_percentile_filter": {
            "fn": quality_percentile_filter,
            "oracle": QUALITY_PERCENTILE_ORACLE,
        },
        "text_quality_score": {"fn": quality_score, "oracle": QUALITY_SCORE_ORACLE},
        "text_lang_id": {"fn": lang_id, "oracle": LANG_ID_ORACLE},
        "text_lang_confusion": {"fn": lang_confusion, "oracle": LANG_CONFUSION_ORACLE},
        "text_compression_ratio": {
            "fn": compression_envelope,
            "oracle": COMPRESSION_ENVELOPE_ORACLE,
        },
        "corpus_source_overlap": {
            "fn": source_overlap,
            "oracle": _source_overlap_oracle(),
        },
        "tokens_pmi_top_pairs": {"fn": pmi_top_pairs, "oracle": PMI_ORACLE},
        "corpus_signal_correlations": {
            "fn": signal_correlations,
            "oracle": SIGNAL_CORR_ORACLE,
        },
        "quality_classifier_calibration": {
            "fn": classifier_calibration,
            "oracle": CALIBRATION_ORACLE,
        },
        "corpus_zipf_fit": {"fn": zipf_fit, "oracle": ZIPF_ORACLE},
        "corpus_novelty_curve": {"fn": novelty_curve, "oracle": _novelty_oracle()},
        "text_fingerprint": {"fn": fingerprint, "oracle": FINGERPRINT_ORACLE},
        "text_unigram_logprob": {"fn": unigram_logprob, "oracle": UNIGRAM_LOGPROB_ORACLE},
        "text_bigram_logprob": {"fn": bigram_logprob, "oracle": BIGRAM_LOGPROB_ORACLE},
        "text_repetition": {"fn": repetition, "oracle": REPETITION_ORACLE},
        "text_pii_redact": {"fn": pii_redact, "oracle": _duck_pii_oracle()},
        "corpus_source_stats": {"fn": source_stats, "oracle": SOURCE_STATS_ORACLE},
        "corpus_source_divergence": {
            "fn": source_divergence,
            "oracle": SOURCE_DIVERGENCE_ORACLE,
        },
        "tokens_bigrams_udtf": {
            "fn": bigrams_udtf_top,
            "oracle": BIGRAMS_UDTF_ORACLE,
        },
        "quality_classifier_train": {
            "fn": classifier_train,
            "oracle": CLASSIFIER_TRAIN_ORACLE,
        },
        "text_quality_classifier": {
            "fn": quality_classifier,
            "oracle": QUALITY_CLASSIFIER_ORACLE,
        },
    }
