"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints the full record as the first
JSON line (and writes it to BENCH_DETAIL.json):
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}
then a FINAL compact JSON line guaranteed <= 1900 chars — the round
driver keeps only the last 2000 chars of stdout, so the last line is
the durable machine-readable record (VERDICT r10 ask #6); it carries
the envelope, a curated named subset, all timings as an array in
HEADLINE order (md5-pinned), the ANN split, and the recalls.

Each query is forced with a cheap action (count on the final frame) so
the measured time is plan execution, not driver serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    # reference-parity SQL surface (scan/filter/join/agg/window/topk)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "agg_rollup",
    "agg_count_distinct",
    "win_topk_per_group",
    "events_sessionization",
    # north-star pipeline operators
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_components",
    "dedup_incremental_batch",
    "dedup_simhash_pairs",
    "dedup_prefix_filter_jaccard",
    "sketch_cms_heavy_hitters",
    "sketch_histogram_quantiles",
    "text_quality_score",
    "ann_brute_force_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    # r06: the saved-index serving path (build on first invocation,
    # load+search on the second — the min-of-2 protocol therefore
    # reports the SEARCH-ONLY cost of the persisted-artifact contract)
    "ann_pq_from_artifact",
    "ann_ivfpq_topk",
    "search_tfidf_cosine_topk",
    "ann_range_search",
    "embedding_medoid_per_label",
    "dedup_span_coverage",
    "doc_chunk_windows",
    "docs_quality_percentile_filter",
    "events_rollup_multires",
    "search_bm25",
    "asof_join_events_orders",
    "join_bloom_prefilter",
    "dedup_split_leakage",
    "indexer_positional_ids",
    "pipeline_curate_corpus",
    # round-5 late kernels: iterative graph, layout, sequence, MRL eval
    "graph_pagerank_nations",
    "graph_copurchase_hops",
    "layout_zorder_orders",
    "events_pattern_match",
    "embedding_matryoshka_recall",
    # round-5 continuation: importance sampling, tokenizer training,
    # multimodal near-dup, search, in-SQL GD
    "sample_dsir_importance",
    "tokens_bpe_merge_learn",
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    "search_phrase_match",
    "search_fuzzy_terms",
    "quality_classifier_train",
    # streaming (availableNow drain of the events fixture)
    "stream_tumbling_counts",
    "stream_docs_incremental_dedup",
    # r08: the real-PNG codec path joins the headline at its freeze-exit
    # registration (VERDICT r06 ask #7 / r07 ask #7 — the one planned
    # addition; the rest of the set stays frozen at the r06/r07 list)
    "multimodal_decode_png",
    # r09: one ES-DSL entry tracks the flagship query-DSL surface
    # (VERDICT r08 ask #5 — the one planned addition this round): a
    # BM25-scored match is the ES default search experience, and its
    # cost profile (tokenize + tf/df aggs + stats broadcast) is the
    # DSL's heaviest compiled shape.
    "es_dsl_match_scored",
    # r10 (VERDICT r09 ask #6): the expensive r09 shapes join the watch
    # set so a regression in the new DSL/codec tier is visible —
    # composite pagination (scan-level lexicographic prune), three-level
    # nested buckets (widest agg), top_hits (per-bucket ranking window),
    # and the baseline-JPEG mapInPandas codec. Plus the r10 in-body
    # highlight (BM25 top-k + snippet join-back, the new heaviest
    # scored shape).
    "es_dsl_composite_after",
    "es_dsl_nested_three_levels",
    "es_dsl_top_hits",
    "multimodal_decode_jpeg",
    "es_dsl_match_highlight",
    # r10 batches 6-11: the expensive new DSL shapes — the parsed
    # query-string language (token-level wildcards + phrase LIKEs over
    # two fields), the two-pass MAD join-back, the token-exploding
    # significant_text, the stateless scroll continuation (page-1
    # collect + scan-pruned page 2), and the one-scan adjacency matrix
    "es_dsl_query_string",
    "es_dsl_mad",
    "es_dsl_significant_text",
    "es_scroll_page2",
    "es_dsl_adjacency_matrix",
    # r10 batches 18-25: the expensive new shapes — rescore (TWO BM25
    # CTE chains + window join-back, now the heaviest scored plan),
    # knn (exact cosine top-k over the embedding column), has_child
    # (child-side aggregate then semi-join into orders), geotile_grid
    # (transcendental tile keys + three geo metrics over a runtime-
    # mapped projection), matrix_stats (six DECIMAL product sums in
    # one aggregate), and the generalized function_score functions
    # array (two gated decay curves over the scored join-back)
    "es_dsl_rescore",
    "es_dsl_knn",
    "es_dsl_has_child",
    "es_dsl_geotile_grid",
    "es_dsl_matrix_stats",
    "es_dsl_function_score_functions",
    # batches 29-32: one ES|QL statement per cost family (agg pipe,
    # regex extraction) and the scored-bool sum (three BM25 chains +
    # two id-keyed joins — the widest everyday scoring plan)
    "esql_date_case",
    "esql_grok_extract",
    "es_dsl_scored_bool",
    # r11 (VERDICT r10 ask #7): the r10 heavyweights most likely to
    # regress silently — the vocabulary-explode suggester, the
    # rare-term MLT selection, and the window-function INLINESTATS
    # compile path.
    "es_dsl_suggest_term",
    "es_dsl_more_like_this",
    "esql_inlinestats",
]

# Fixed order of the ann_build_search readings in the final line's
# "ann" array (names in the verbose record / BENCH_DETAIL.json).
ANN_ORDER = [
    "ivf_build", "ivf_search", "pq_build", "pq_search",
    "ivfpq_build", "ivfpq_search",
    "ivfpq_residual_build", "ivfpq_residual_search",
]

# Named subset carried verbatim on the durable final line: the TPC-H
# headline + the heaviest / watch-listed shapes.
DIGEST_SUBSET = [
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q10_returned_items",
    "dedup_minhash_lsh", "dedup_incremental_batch",
    "ann_ivf_topk", "ann_ivfpq_topk", "search_bm25",
    "graph_copurchase_hops", "stream_tumbling_counts",
    "stream_docs_incremental_dedup", "multimodal_decode_jpeg",
    "tokens_bpe_merge_learn", "es_dsl_match_scored",
    "es_dsl_rescore", "es_dsl_scored_bool",
    "es_dsl_match_highlight", "esql_date_case",
    "es_dsl_suggest_term", "es_dsl_more_like_this",
    "esql_inlinestats",
]


def build_digest(total: float, sf, timings: dict, ann_split: dict,
                 recalls: dict, load: dict | None = None,
                 spread: dict | None = None) -> dict:
    """The durable final-line record (see module docstring). ``load``
    and ``spread`` are the host-noise stamps (VERDICT r11 ask #5):
    same-code readings on this shared box were measured 2x whole-run /
    9x per-key apart under load, so every bench record carries the
    1/5/15-min loadavg at start+end and the min-of-N spread summary —
    a noisy session is mechanically discountable from the artifact
    alone."""
    import hashlib  # noqa: PLC0415

    return {
        "metric": "headline_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "queries": {n: timings[n] for n in DIGEST_SUBSET},
        "t": [timings[n] for n in HEADLINE],
        "t_names_md5": hashlib.md5(
            ",".join(HEADLINE).encode()).hexdigest(),
        "ann": [ann_split[k] for k in ANN_ORDER],
        "recalls": recalls,
        "load": load or {},
        "spread": spread or {},
    }


def spread_summary(runs: dict[str, list[float]]) -> dict:
    """max/min ratio per query, summarized: median and worst ratio +
    the worst query's name. A clean session sits near 1.0x median;
    >2x medians mean the host was contended and cross-round deltas
    from this record are not evidence."""
    ratios = {
        n: (max(ts) / min(ts) if min(ts) > 0 else 1.0)
        for n, ts in runs.items() if len(ts) >= 2
    }
    if not ratios:
        return {}
    vals = sorted(ratios.values())
    worst = max(ratios, key=ratios.get)
    return {
        "median_ratio": round(vals[len(vals) // 2], 3),
        "max_ratio": round(ratios[worst], 3),
        "max_query": worst,
    }


def main() -> None:
    from golang_db_query_engine_elasticsearch_indexer_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(app_name="bench")
    qs = entry.queries()
    timings: dict[str, float] = {}
    # Warm the JVM, parquet footers, and codegen/JIT for the heavy
    # operator shapes at the tiny scale factor (JMH-style warmup): the
    # sf0.1 timings then measure steady-state throughput — the number
    # that matters for cluster sizing — not first-compile latency.
    qs["proj_distinct"](spark, SF_DIR).count()
    for warm in (
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "ann_ivf_topk",
        "ann_pq_topk",
        "dedup_components",
    ):
        qs[warm](spark, "/root/testdata/sf0.001").count()

    # Min-of-2 per query: a single-shot timing is hostage to whatever
    # else the machine is doing (the r03 driver record was ~2x a
    # controlled rerun of the same script); the min of two executions
    # is a contention-robust estimate of the plan's actual cost. Both
    # raw readings are kept (runs) so the record carries the per-query
    # spread alongside the loadavg stamps (VERDICT r11 ask #5).
    load_start = [round(x, 2) for x in os.getloadavg()]
    total = 0.0
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = qs[name]
        rs: list[float] = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            rs.append(round(time.time() - t0, 3))
        runs[name] = rs
        best = min(rs)
        timings[name] = best
        total += best

    # ANN build/search split (VERDICT r04 ask #3): the self-contained
    # headline entries above pay quantizer training per query (the
    # driver contract); real serving builds once and searches many. Time
    # the build artifacts and the search-only paths separately — the
    # number a cluster-sizing exercise actually needs. Not added to the
    # headline total (training is already counted there, inside
    # ann_ivf_topk / ann_pq_topk).
    from golang_db_query_engine_elasticsearch_indexer_spark.operators import similarity
    from golang_db_query_engine_elasticsearch_indexer_spark.session import (
        register_sf_dir,
    )

    register_sf_dir(spark, SF_DIR)
    ann_split: dict[str, float] = {}
    t0 = time.time()
    cents = similarity.ivf_build(spark)
    ann_split["ivf_build"] = round(time.time() - t0, 3)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        similarity.ivf_topk(spark, SF_DIR, cents=cents).count()
        best = min(best, time.time() - t0)
    ann_split["ivf_search"] = round(best, 3)
    t0 = time.time()
    pq_index = similarity.pq_build(spark, SF_DIR, persist=True)
    ann_split["pq_build"] = round(time.time() - t0, 3)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        similarity.pq_search(spark, SF_DIR, pq_index).count()
        best = min(best, time.time() - t0)
    ann_split["pq_search"] = round(best, 3)
    pq_index.release()
    t0 = time.time()
    ivfpq_index = similarity.ivfpq_build(spark, SF_DIR, persist=True)
    ann_split["ivfpq_build"] = round(time.time() - t0, 3)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        similarity.ivfpq_search(spark, SF_DIR, ivfpq_index).count()
        best = min(best, time.time() - t0)
    ann_split["ivfpq_search"] = round(best, 3)
    ivfpq_index.release()
    t0 = time.time()
    res_index = similarity.ivfpq_residual_build(spark, SF_DIR, persist=True)
    ann_split["ivfpq_residual_build"] = round(time.time() - t0, 3)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        similarity.ivfpq_residual_search(spark, SF_DIR, res_index).count()
        best = min(best, time.time() - t0)
    ann_split["ivfpq_residual_search"] = round(best, 3)
    res_index.release()

    # Measured recall of the banded-LSH near-dup kernel vs the exact
    # all-pairs baseline — reported so the approximation is visible
    # outside the test suite (ADVICE r02). Measured at sf0.01 (cheap:
    # the baseline is O(n^2)) and NOT part of the timed headline.

    recall_sf = "/root/testdata/sf0.01"
    register_sf_dir(spark, recall_sf)
    banded = {(r.va, r.vb) for r in similarity.neardup_pairs(spark, recall_sf).collect()}
    allp = {
        (r.va, r.vb) for r in similarity.neardup_pairs_allpairs(spark, recall_sf).collect()
    }
    recall = round(len(banded) / max(len(allp), 1), 4)
    exact_topk = {
        (r.probe_id, r.neighbor_id)
        for r in similarity.brute_force_topk(spark, recall_sf).collect()
    }
    ivf_topk = {
        (r.probe_id, r.neighbor_id)
        for r in similarity.ivf_topk(spark, recall_sf).collect()
    }
    ivf_recall = round(len(exact_topk & ivf_topk) / max(len(exact_topk), 1), 4)
    pq_topk = {
        (r.probe_id, r.neighbor_id)
        for r in similarity.pq_topk(spark, recall_sf).collect()
    }
    pq_recall = round(len(exact_topk & pq_topk) / max(len(exact_topk), 1), 4)
    ivfpq_topk = {
        (r.probe_id, r.neighbor_id)
        for r in similarity.ivfpq_topk(spark, recall_sf).collect()
    }
    ivfpq_recall = round(len(exact_topk & ivfpq_topk) / max(len(exact_topk), 1), 4)
    res_topk = {
        (r.probe_id, r.neighbor_id)
        for r in similarity.ivfpq_residual_topk(spark, recall_sf).collect()
    }
    res_recall = round(len(exact_topk & res_topk) / max(len(exact_topk), 1), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    load = {
        "start_1m_5m_15m": load_start,
        "end_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
    }
    spread = spread_summary(runs)
    record = {
        "metric": "headline_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "load": load,
        "spread": spread,
        "ann_build_search": ann_split,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "neardup_recall_sf0.01": recall,
        "ivf_recall_at_k_sf0.01": ivf_recall,
        "pq_recall_at_k_sf0.01": pq_recall,
        "ivfpq_recall_at_k_sf0.01": ivfpq_recall,
        "ivfpq_residual_recall_at_k_sf0.01": res_recall,
    }
    # Full verbose record: first stdout line + a committed artifact.
    print(json.dumps(record))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(record, f, indent=1)

    # FINAL line: the driver keeps only the LAST 2000 chars of stdout
    # and json-parses the last line found in that window (BENCH_r10's
    # record went lossy because the verbose line is ~2.6k chars). The
    # full named dict cannot fit — ~75 query names alone are ~1.8k —
    # so the durable line carries the envelope, a curated named subset
    # (DIGEST_SUBSET), ALL timings as an array in HEADLINE order
    # (pinned by md5 of the name list, recoverable from this file at
    # the same commit), the ANN split in ANN_ORDER, and the recalls.
    # A guard asserts it fits.
    digest = build_digest(
        total, record["sf"], timings, ann_split,
        {"neardup": recall, "ivf": ivf_recall, "pq": pq_recall,
         "ivfpq": ivfpq_recall, "ivfpq_res": res_recall},
        load=load, spread=spread,
    )
    line = json.dumps(digest, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"final bench line {len(line)} chars > 1900: trim the named "
        "subset so the driver's 2000-char tail keeps the whole line"
    )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
