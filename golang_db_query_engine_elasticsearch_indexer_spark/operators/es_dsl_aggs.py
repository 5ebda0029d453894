"""ES Query-DSL compiler — AGGREGATION CONTEXT tier (split from es_dsl.py).

Metric columns (exact-DECIMAL discipline), bucket kinds (terms /
histogram family / range / rare_terms / multi_terms /
auto_date_histogram / sampler / significant_* / adjacency_matrix /
composite / filters / nested-to-three-levels / top_hits), parent and
sibling pipeline aggs (ordered window wraps, order-free normalize /
bucket_sort, row-local bucket_script / bucket_selector), and zero-fill
axes. Documented in operators/es_dsl.py (the facade, which re-exports
this module's names — import from there).
"""

from __future__ import annotations

import re

from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_dsl_query import (  # noqa: F401
    _compile_script,
    _geo_cols,
    _geo_point,
    _haversine,
    _ident,
    _lit,
    _one,
    _query_expr,
    _tokens_expr,
)


# --- aggregation context -----------------------------------------------------

_METRICS = {"avg", "sum", "min", "max", "value_count", "cardinality",
            "stats", "extended_stats", "percentiles", "percentile_ranks",
            "weighted_avg", "string_stats", "boxplot"}

# Metric kinds that render as MULTIPLE columns (stats_<name>_count/…,
# <name>_p50/…) or otherwise not under the sub-agg's own name
# (top_metrics emits <name>_<field>): never valid as a terms `order`
# target or a pipeline `buckets_path` — there is no column named by
# the sub-agg to order by / read from. Rejecting them here keeps the
# failure a compile-time ValueError instead of a downstream binder
# error on a nonexistent column (ADVICE r09 finding #1).
_MULTI_COLUMN_METRICS = frozenset(
    {"stats", "extended_stats", "percentiles", "percentile_ranks",
     "top_metrics", "string_stats", "boxplot", "geo_centroid",
     "geo_bounds"}
)


# Float discipline for sum/avg: double summation is ORDER-dependent,
# and a round() on top flips at half boundaries when Spark's partial
# aggregation order differs from DuckDB's single-threaded scan (bit us
# live: avg(value) on one fixture day is exactly 46.49875, rounding to
# .4987 or .4988 by partition count). So measures quantize to 6 dp
# into DECIMAL (exact for the fixture's 2-dp values), the DECIMAL sum
# is exact and order-independent, and the emitted double is the raw
# IEEE result of identical operations on identical operands — no final
# round, nothing for partitioning to flip.
_DEC = "DECIMAL(28, 6)"


def _metric_cols(name: str, kind: str, m: dict, dialect: str) -> list[str]:
    # weighted_avg nests its fields under value/weight; every other
    # metric names a top-level field
    if kind != "weighted_avg" and "field" not in m:
        raise ValueError(f"es_dsl: {kind} requires a field")
    f = _ident(m["field"]) if "field" in m else None
    if f is not None and "missing" in m:
        # ES metric `missing`: docs lacking the field contribute the
        # stand-in value instead of being skipped — one coalesce
        mv = m["missing"]
        if not isinstance(mv, (int, float)) or isinstance(mv, bool):
            raise ValueError(
                f"es_dsl: {kind} missing must be numeric"
            )
        f = f"coalesce({f}, {_lit(mv, dialect)})"
    exact_sum = f"cast(sum(cast({f} AS {_DEC})) AS DOUBLE)"
    if kind == "value_count":
        return [f"count({f}) AS {name}"]
    if kind == "cardinality":
        # ES's is approximate (HLL); exact here for the differential —
        # the engine's sketch lives in sketch_hll_distinct_users. A
        # `precision_threshold` knob is accepted and ignored (the knn
        # num_candidates precedent: the exact computation supersedes
        # an approximation-accuracy knob)
        return [f"count(DISTINCT {f}) AS {name}"]
    if kind == "sum":
        return [f"{exact_sum} AS {name}"]
    if kind == "avg":
        return [f"{exact_sum} / count({f}) AS {name}"]
    if kind == "stats":
        return [
            f"count({f}) AS {name}_count",
            f"round(min({f}), 4) AS {name}_min",
            f"round(max({f}), 4) AS {name}_max",
            f"{exact_sum} / count({f}) AS {name}_avg",
            f"{exact_sum} AS {name}_sum",
        ]
    if kind == "extended_stats":
        # ES extended_stats: stats + sum_of_squares + POPULATION
        # variance/std. The squares quantize to DECIMAL first (exact,
        # order-independent), then variance/std are the raw IEEE
        # doubles of identical arithmetic on identical operands in
        # both engines — same discipline as sum/avg. The square
        # operands are DECIMAL(18,6), NOT the module _DEC(28,6):
        # multiplying two (28,6) needs precision 57, which overflows
        # DuckDB's 38-digit cap and silently degrades to a DOUBLE
        # product (order-dependent sum — caught live at sf0.1);
        # (18,6)x(18,6) -> (37,12) stays exact in both engines. The
        # exact DECIMAL(38,12) sums agree bit-for-bit, but DuckDB's
        # int128 -> DOUBLE cast is off by one ulp when the scaled
        # integer exceeds 2^53 (caught live at sf0.1); rounding the
        # exact sum to 4 dp first (lossless: 2-dp inputs square to
        # exactly 4 dp) keeps the scaled integer in the exact range,
        # where both engines' casts round correctly.
        sq = (
            f"cast(round(sum(cast({f} AS DECIMAL(18, 6))"
            f" * cast({f} AS DECIMAL(18, 6))), 4) AS DOUBLE)"
        )
        var = f"({sq} - ({exact_sum} * {exact_sum}) / count({f})) / count({f})"
        return [
            f"count({f}) AS {name}_count",
            f"round(min({f}), 4) AS {name}_min",
            f"round(max({f}), 4) AS {name}_max",
            f"{exact_sum} / count({f}) AS {name}_avg",
            f"{exact_sum} AS {name}_sum",
            f"{sq} AS {name}_sum_of_squares",
            f"{var} AS {name}_variance",
            f"sqrt({var}) AS {name}_std_deviation",
        ]
    if kind == "percentile_ranks":
        # ES percentile_ranks: for each given value, the percentage of
        # observations <= it. The exact count-ratio form (ES's own is
        # TDigest-approximate): integer counts and one multiply/divide
        # on exact doubles — identical in both engines, no rounding
        # discipline needed.
        values = m.get("values")
        if not isinstance(values, list) or not values or not all(
            isinstance(x, (int, float)) and not isinstance(x, bool)
            for x in values
        ):
            raise ValueError("es_dsl: percentile_ranks wants a values list")
        cols = []
        for v in values:
            label = (f"{v:g}").replace(".", "_").replace("-", "m")
            hits = (
                f"sum(CASE WHEN {f} <= {_lit(v, dialect)} THEN 1 ELSE 0 END)"
            )
            cols.append(
                f"cast(100 AS DOUBLE) * {hits} / count({f})"
                f" AS {name}_rank_{label}"
            )
        return cols
    if kind == "weighted_avg":
        # ES weighted_avg: sum(value*weight)/sum(weight). Products and
        # sums quantize to DECIMAL (the (18,6)x(18,6) product stays in
        # range; the product sum rounds to 4 dp in the decimal domain
        # before the DOUBLE cast — the same two DuckDB traps
        # extended_stats hit, pre-empted), then one raw-double divide.
        vf = _ident(m["value"]["field"])
        wf = _ident(m["weight"]["field"])
        num = (
            f"cast(round(sum(cast({vf} AS DECIMAL(18, 6))"
            f" * cast({wf} AS DECIMAL(18, 6))), 4) AS DOUBLE)"
        )
        den = f"cast(sum(cast({wf} AS {_DEC})) AS DOUBLE)"
        return [f"{num} / {den} AS {name}"]
    if kind == "percentiles":
        # ES percentiles (default percents as in ES). ES's is
        # approximate (TDigest); EXACT interpolated quantiles here for
        # the differential — both engines share the (1-g)*a + g*b
        # interpolation on the sorted values, so the raw doubles agree
        # with no summation-order hazard. Column per percent:
        # {name}_p50, {name}_p99_9 (dots -> underscores).
        percents = m.get("percents", [1, 5, 25, 50, 75, 95, 99])
        if not isinstance(percents, list) or not percents or not all(
            isinstance(x, (int, float)) and not isinstance(x, bool)
            and 0 <= x <= 100 for x in percents
        ):
            raise ValueError("es_dsl: percents must be numbers in [0, 100]")
        cols = []
        for pc in percents:
            q = repr(pc / 100.0)
            label = (f"{pc:g}").replace(".", "_").replace("-", "m")
            fn = (
                f"percentile({f}, {q})" if dialect == "spark"
                else f"quantile_cont({f}, {q})"
            )
            # the engines' internal interpolation paths drift at
            # ~1e-12 (caught live at p99.9), so outputs quantize
            # through DECIMAL(18,6): with k-dp data and 3-digit
            # percents the true value is an exact <=(k+3)-dp decimal,
            # leaving >=5 orders of magnitude between the drift and
            # the 6-dp half boundary — lossless AND flip-proof
            cols.append(
                f"cast(cast({fn} AS DECIMAL(18, 6)) AS DOUBLE)"
                f" AS {name}_p{label}"
            )
        return cols
    if kind == "string_stats":
        # ES string_stats: count / min_length / max_length / avg_length
        # over the field's character lengths. `entropy` (and
        # show_distribution) need a character-frequency relation — a
        # different aggregation shape — so the column is OMITTED from
        # the schema (visible, not a silent wrong value) and the knob
        # raises. avg follows the exact-DECIMAL sum discipline
        # (integer lengths, so (28,6) is lossless).
        if m.get("show_distribution"):
            raise ValueError(
                "es_dsl: string_stats show_distribution is unsupported "
                "(the entropy/distribution columns need a character-"
                "frequency aggregation this compiler does not emit)"
            )
        ln = f"length({f})"
        lsum = f"cast(sum(cast({ln} AS {_DEC})) AS DOUBLE)"
        return [
            f"count({f}) AS {name}_count",
            f"min({ln}) AS {name}_min_length",
            f"max({ln}) AS {name}_max_length",
            f"{lsum} / count({f}) AS {name}_avg_length",
        ]
    if kind == "boxplot":
        # ES boxplot: the five-number summary via the same exact
        # interpolated quantiles as `percentiles` (ES's own is
        # TDigest-approximate). The IQR whisker columns (lower/upper)
        # need a second conditional pass against the bucket's own
        # q1/q3 — omitted from the schema, documented; a
        # `compression` knob is accepted and ignored (the exactness-
        # supersedes-approximation-knob precedent).
        bad = set(m) - {"field", "compression"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported boxplot keys {sorted(bad)}"
            )
        # explicit DOUBLE on min/max: over an integer column Spark's
        # round(min) stays integral while DuckDB's quantile family is
        # float — the boundary columns must agree for the driver hash
        cols = [f"cast(round(min({f}), 4) AS DOUBLE) AS {name}_min"]
        for pc, lab in ((25, "q1"), (50, "q2"), (75, "q3")):
            fn = (
                f"percentile({f}, {pc / 100.0!r})" if dialect == "spark"
                else f"quantile_cont({f}, {pc / 100.0!r})"
            )
            cols.append(
                f"cast(cast({fn} AS DECIMAL(18, 6)) AS DOUBLE)"
                f" AS {name}_{lab}"
            )
        cols.append(f"cast(round(max({f}), 4) AS DOUBLE) AS {name}_max")
        return cols
    return [f"round({kind}({f}), 4) AS {name}"]


_BUCKETS = {"terms", "date_histogram", "histogram", "range"}
_PIPELINE = {"cumulative_sum", "derivative", "serial_diff", "moving_fn",
             "moving_percentiles"}
_SIBLING_PIPELINE = {"avg_bucket", "sum_bucket", "min_bucket", "max_bucket",
                     "stats_bucket", "percentiles_bucket"}
# sibling pipelines that render as MULTIPLE columns — not addressable
# as a buckets_path / selector target (the _MULTI_COLUMN_METRICS rule)
_MULTI_COLUMN_SIBLINGS = {"stats_bucket", "percentiles_bucket"}
# order-free parent pipelines: normalize (whole-relation rescale) and
# bucket_sort (re-sort/truncate the returned buckets) need no bucket
# ordering, so unlike _PIPELINE they also compose with terms parents
_UNORDERED_PIPELINE = {"normalize", "bucket_sort"}
# row-local parent pipelines: no bucket ordering needed — bucket_script
# computes a derived metric per bucket, bucket_selector filters buckets
# (the HAVING / derived-metric idiom of Kibana dashboard bodies)
_ROWLOCAL_PIPELINE = {"bucket_script", "bucket_selector"}


def _metric_list(
    sub_aggs: list[tuple[str, dict]], dialect: str, id_field: str = "doc_id"
) -> list[str]:
    """SQL select-list fragments for metric sub-aggs, validated loudly."""
    out: list[str] = []
    for sub_name, sub_spec in sub_aggs:
        mkind, m = _one(sub_spec, f"sub-agg {sub_name}")
        if mkind == "top_metrics":
            out += _top_metrics_cols(_ident(sub_name), m, dialect, id_field)
            continue
        if mkind == "t_test":
            out += _t_test_cols(_ident(sub_name), m, dialect, id_field)
            continue
        if mkind in ("geo_centroid", "geo_bounds"):
            # geo metrics over the f_lat/f_lon column convention.
            # centroid = arithmetic mean of coords (the ES formula),
            # through the DECIMAL quantize discipline so double
            # summation order can't flip the 6-dp display round;
            # bounds = the min/max envelope (exact, no float hazard)
            if set(m) != {"field"}:
                raise ValueError(f"es_dsl: {mkind} wants {{field}} only")
            lat, lon = _geo_cols(m["field"])
            name = _ident(sub_name)
            if mkind == "geo_centroid":
                # NOT round(avg(DECIMAL), 6): Spark's avg over DECIMAL
                # stays exact DECIMAL (ties round HALF_UP) while
                # DuckDB's returns DOUBLE (ties round by the binary
                # value) — avg(1.000003, 1.000002) demonstrably split
                # the engines (r13). House discipline instead: exact
                # decimal sum cast to the SAME double in both engines,
                # identical division, then the tie resolved in exact
                # decimal space (the esql ROUND pattern; lat/lon are
                # degree-bounded so no overflow/non-finite guard).
                def _cent(col: str) -> str:
                    a = (
                        f"cast(sum(cast({col} AS {_DEC})) AS DOUBLE)"
                        f" / count({col})"
                    )
                    return (
                        f"cast(round(cast({a} AS DECIMAL(38, 12)), 6)"
                        " AS DOUBLE)"
                    )

                out += [
                    f"{_cent(lat)} AS {name}_lat",
                    f"{_cent(lon)} AS {name}_lon",
                ]
            else:
                out += [
                    f"max({lat}) AS {name}_top",
                    f"min({lat}) AS {name}_bottom",
                    f"min({lon}) AS {name}_left",
                    f"max({lon}) AS {name}_right",
                ]
            continue
        if mkind not in _METRICS:
            raise ValueError(f"es_dsl: unsupported sub-agg {mkind!r}")
        out += _metric_cols(_ident(sub_name), mkind, m, dialect)
    return out


def _t_test_cols(name: str, m: dict, dialect: str,
                 id_field: str) -> list[str]:
    """ES `t_test` (the A/B-comparison metric), Welch heteroscedastic
    form: each population is a filtered side of ONE scan (conditional
    aggregates — no second pass), sample variances via the
    extended_stats DECIMAL discipline. Emits `{name}_t_statistic` —
    the p-value ES reports needs the t-distribution CDF, which neither
    SQL dialect has; the STATISTIC column is the honest relational
    equivalent, and the schema makes the difference visible (the
    string_stats-entropy precedent). Paired and homoscedastic types
    raise."""
    bad = set(m) - {"a", "b", "type"}
    if bad:
        raise ValueError(f"es_dsl: unsupported t_test keys {sorted(bad)}")
    if m.get("type", "heteroscedastic") != "heteroscedastic":
        raise ValueError(
            "es_dsl: t_test supports type heteroscedastic (Welch) only"
        )
    sides = []
    for side in ("a", "b"):
        spec = m.get(side)
        if not isinstance(spec, dict) or "field" not in spec or (
            set(spec) - {"field", "filter"}
        ):
            raise ValueError(
                f"es_dsl: t_test {side} wants {{field, filter?}}"
            )
        f = _ident(spec["field"])
        cond = (
            f"coalesce({_query_expr(spec['filter'], dialect, id_field)}"
            ", FALSE)"
            if "filter" in spec else "TRUE"
        )
        n = f"sum(CASE WHEN {cond} AND {f} IS NOT NULL THEN 1 ELSE 0 END)"
        s = (
            f"cast(sum(CASE WHEN {cond} THEN cast({f} AS {_DEC}) END)"
            " AS DOUBLE)"
        )
        sq = (
            f"cast(round(sum(CASE WHEN {cond} THEN"
            f" cast({f} AS DECIMAL(18, 6))"
            f" * cast({f} AS DECIMAL(18, 6)) END), 4) AS DOUBLE)"
        )
        mean = f"({s} / {n})"
        var = f"(({sq} - {s} * {s} / {n}) / ({n} - 1))"
        sides.append((n, mean, var))
    (na, ma, va), (nb, mb, vb) = sides
    t = f"({ma} - {mb}) / sqrt({va} / {na} + {vb} / {nb})"
    return [f"round({t}, 4) AS {name}_t_statistic"]


def _top_metrics_cols(
    name: str, m: dict, dialect: str, id_field: str
) -> list[str]:
    """ES `top_metrics`: the metric field's value on the bucket's
    sort-extremum row ("the latest reading per host") — one max_by/
    min_by per requested metric, fully composable with other metric
    sub-aggs (unlike top_hits, which changes the relation shape).
    Sort-key comparison is at one-second granularity with id ties
    (sub-second ordering resolves by id — integer epoch truncation is
    what keeps both engines' arithmetic identical; ES leaves ties
    undefined anyway); the composite (sort, id) key is exact
    DECIMAL(38,0) — no double-precision loss past 2^53 — because
    neither engine's max_by accepts a struct key. size > 1 raises
    (multi-row output is top_hits' shape)."""
    bad = set(m) - {"metrics", "sort", "size"}
    if bad:
        raise ValueError(f"es_dsl: unsupported top_metrics keys {sorted(bad)}")
    if int(m.get("size", 1)) != 1:
        raise ValueError(
            "es_dsl: top_metrics size > 1 is unsupported (use top_hits)"
        )
    sf, d = _one(m.get("sort") or {}, "top_metrics sort")
    d = d if isinstance(d, str) else d.get("order", "asc")
    if d not in ("asc", "desc"):
        raise ValueError(f"es_dsl: bad top_metrics sort order {d!r}")
    mets = m.get("metrics")
    if isinstance(mets, dict):
        mets = [mets]
    if not isinstance(mets, list) or not mets or not all(
        isinstance(x, dict) and set(x) == {"field"} for x in mets
    ):
        raise ValueError(
            "es_dsl: top_metrics metrics wants {field} or a list of them"
        )
    sfi = _ident(sf)
    # the sort field must be TEMPORAL ("the latest reading" idiom —
    # a non-timestamp sort field fails loudly at bind time): integer
    # epoch seconds (the fixed_interval discipline) shifted left 18
    # digits + the id — exact DECIMAL(38,0), engine-identical, room
    # for 10^18 ids per second
    ep = "unix_timestamp" if dialect == "spark" else "epoch"
    composite = (
        f"cast(floor({ep}({sfi})) AS DECIMAL(38, 0))"
        f" * 1000000000000000000 + {id_field}"
    )
    fn = "max_by" if d == "desc" else "min_by"
    return [
        f"{fn}({_ident(x['field'])}, {composite}) AS "
        f"{name}_{_ident(x['field'])}"
        for x in mets
    ]


_UNIT_SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
              "week": 604800}


def _date_histo_secs(b: dict) -> int:
    """Bucket width in seconds for a date_histogram spec — defined for
    fixed_interval and the constant-width calendar units; month/year
    raise (variable length, a per-bucket divisor this compiler does
    not emit)."""
    if "fixed_interval" in b:
        mi = re.fullmatch(r"(\d+)([smhd])", str(b["fixed_interval"]))
        if not mi:
            raise ValueError(
                f"es_dsl: bad fixed_interval {b['fixed_interval']!r}"
            )
        return int(mi.group(1)) * {"s": 1, "m": 60, "h": 3600,
                                   "d": 86400}[mi.group(2)]
    unit = b.get("calendar_interval", "day")
    if unit in ("day", "week"):
        return _UNIT_SECS[unit]
    raise ValueError(
        f"es_dsl: rate under a {unit!r} calendar_interval is "
        "unsupported (variable bucket length; use fixed_interval or "
        "day/week)"
    )


def _rate_cols(rates: list[tuple[str, dict]], kind: str, b: dict,
               dialect: str) -> list[str]:
    """ES `rate` metric: per-bucket sum (or doc count) rescaled from
    the bucket interval to the requested unit — "events per hour" on a
    6-hour axis. Row-local arithmetic on the aggregated bucket: the
    divisor bucket_secs/unit_secs is one compile-time literal, exact
    in both engines."""
    if kind != "date_histogram":
        raise ValueError(
            "es_dsl: rate requires a date_histogram parent"
        )
    secs = _date_histo_secs(b)
    cols: list[str] = []
    for name, spec in rates:
        r = spec["rate"]
        bad = set(r) - {"field", "unit"}
        if bad:
            raise ValueError(f"es_dsl: unsupported rate keys {sorted(bad)}")
        unit = r.get("unit", "second")
        if unit not in _UNIT_SECS:
            raise ValueError(
                f"es_dsl: bad rate unit {unit!r} "
                f"({'/'.join(_UNIT_SECS)})"
            )
        div = secs / _UNIT_SECS[unit]
        if "field" in r:
            f = _ident(r["field"])
            num = f"cast(sum(cast({f} AS {_DEC})) AS DOUBLE)"
        else:
            num = "cast(count(*) AS DOUBLE)"
        cols.append(f"{num} / {div!r} AS {_ident(name)}")
    return cols


def _compile_mad(index: str, b: dict, mad: tuple[str, dict], where: str,
                 key: str, dialect: str) -> str:
    """ES `median_absolute_deviation`: median(|x - median(x)|) per
    bucket — EXACT here (ES's is TDigest-approximate), as two
    aggregations over one scan: bucket medians first (bucket-
    cardinality relation, broadcast by AQE), joined back for the
    deviation median. Quantiles share the percentiles discipline
    (interpolated, DECIMAL(18,6)-quantized)."""
    name, spec = mad
    m = spec["median_absolute_deviation"]
    if set(spec) != {"median_absolute_deviation"}:
        raise ValueError(
            "es_dsl: median_absolute_deviation takes no sibling keys"
        )
    bad = set(m) - {"field", "compression"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported median_absolute_deviation keys "
            f"{sorted(bad)}"
        )
    f = _ident(m["field"])
    tbad = set(b) - {"field", "size"}
    if tbad:
        raise ValueError(
            f"es_dsl: median_absolute_deviation terms parent supports "
            f"field/size only (got {sorted(tbad)})"
        )
    key_expr, _ = _bucket_key("terms", b, dialect)
    size = int(b.get("size", 10))
    pct = "percentile" if dialect == "spark" else "quantile_cont"
    n = _ident(name)
    return f"""
WITH raw AS (
  SELECT {key_expr} AS k, {f} AS v
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL
),
med AS (
  SELECT k, {pct}(v, 0.5) AS m FROM raw GROUP BY k
)
SELECT r.k AS {key}, count(*) AS doc_count,
       cast(cast({pct}(abs(r.v - med.m), 0.5) AS DECIMAL(18, 6))
            AS DOUBLE) AS {n}
FROM raw r JOIN med ON r.k = med.k
GROUP BY r.k
ORDER BY doc_count DESC, {key} ASC
LIMIT {size}
"""


def _bucket_key(kind: str, b: dict, dialect: str) -> tuple[str, str]:
    """(key_expr, order_expr) for one bucket agg — the shared piece the
    nested path composes. ``order_expr`` orders buckets of this kind
    deterministically (range buckets by declaration order, everything
    else by key)."""
    f = _ident(b["field"])
    if kind == "terms":
        if "missing" in b:
            # ES terms `missing`: docs lacking the field bucket under
            # the given stand-in key instead of being dropped
            e = f"coalesce({f}, {_lit(b['missing'], dialect)})"
            return e, e
        return f, f
    if kind == "date_histogram":
        if "fixed_interval" in b:
            # ES fixed_interval ("30m", "6h", ...): bucket key is the
            # ES epoch-millis key, via integer epoch arithmetic that is
            # engine-identical by construction
            if "calendar_interval" in b:
                raise ValueError(
                    "es_dsl: fixed_interval and calendar_interval "
                    "are mutually exclusive"
                )
            mi = re.fullmatch(r"(\d+)([smhd])", str(b["fixed_interval"]))
            if not mi:
                raise ValueError(
                    f"es_dsl: bad fixed_interval {b['fixed_interval']!r}"
                )
            secs = int(mi.group(1)) * {
                "s": 1, "m": 60, "h": 3600, "d": 86400,
            }[mi.group(2)]
            if secs <= 0:
                raise ValueError("es_dsl: fixed_interval must be > 0")
            ep = "unix_timestamp" if dialect == "spark" else "epoch"
            e = (
                f"cast(floor({ep}({f}) / {secs}) * {secs} AS BIGINT)"
                " * 1000"
            )
            return e, e
        unit = b.get("calendar_interval", "day")
        if unit not in ("day", "week", "month", "year"):
            raise ValueError(f"es_dsl: unsupported calendar_interval {unit!r}")
        e = f"cast(date_trunc('{unit}', {f}) AS DATE)"
        return e, e
    if kind == "histogram":
        step = b["interval"]
        if not isinstance(step, (int, float)) or step <= 0:
            raise ValueError("es_dsl: histogram interval must be > 0")
        off = b.get("offset", 0)
        if not isinstance(off, (int, float)) or not 0 <= off < step:
            raise ValueError(
                "es_dsl: histogram offset must satisfy 0 <= offset < "
                "interval (ES contract)"
            )
        # cast: Spark floor(double) is BIGINT, DuckDB's is DOUBLE — the
        # key type must agree for the driver's hash compare
        if off:
            e = (
                f"cast(round(floor(({f} - {off}) / {step}) * {step}"
                f" + {off}, 4) AS DOUBLE)"
            )
        else:
            e = f"cast(round(floor({f} / {step}) * {step}, 4) AS DOUBLE)"
        return e, e
    if kind in ("range", "date_range"):
        # date_range = range with string (ISO date) bounds: from
        # inclusive / to exclusive, same CASE rendering — a date-shaped
        # string literal coerces identically against temporal columns
        # in both dialects (the r09 _lit rule, pushdown-verified)
        case, ordinal = _range_case(f, b["ranges"], dialect)
        return case, ordinal
    if kind == "geo_distance":
        # distance-ring buckets around an origin: the SAME from-
        # inclusive / to-exclusive CASE rendering as `range`, over the
        # haversine expression instead of a column — rings evaluate
        # inside the scan, one GROUP BY
        bad = set(b) - {"field", "origin", "ranges", "unit"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported geo_distance agg keys {sorted(bad)}"
            )
        lat0, lon0 = _geo_point(b.get("origin"), "geo_distance origin")
        unit = b.get("unit", "m")
        if unit not in ("m", "km", "mi"):
            raise ValueError(
                f"es_dsl: bad geo_distance unit {unit!r} (m/km/mi)"
            )
        scale = {"m": 1.0, "km": 1000.0, "mi": 1609.344}[unit]
        lat, lon = _geo_cols(b["field"])
        dist = f"({_haversine(lat, lon, lat0, lon0)} / {scale!r})"
        case, ordinal = _range_case(dist, b["ranges"], dialect)
        return case, ordinal
    raise ValueError(f"es_dsl: unsupported bucket agg {kind!r}")


def _range_case(f: str, ranges: list, dialect: str) -> tuple[str, str]:
    """CASE label + CASE ordinal for disjoint range buckets (ES
    evaluates overlapping ranges independently — one GROUP BY can't,
    so overlap raises)."""
    edges = []
    for r in ranges:
        lo, hi = r.get("from"), r.get("to")
        if lo is None and hi is None:
            raise ValueError("es_dsl: range bucket needs from and/or to")
        edges.append((lo, hi))
    bounds = [x for lo, hi in edges for x in (lo, hi) if x is not None]
    has_str = any(isinstance(x, str) for x in bounds)
    if has_str and not all(isinstance(x, str) for x in bounds):
        raise ValueError(
            "es_dsl: range bounds must be all-numeric or all-string "
            "(date_range); do not mix"
        )
    # overlap sentinels: ISO date strings order lexicographically, so
    # string (date_range) bounds compare directly with string sentinels
    neg = "" if has_str else float("-inf")
    pos = "\U0010ffff" if has_str else float("inf")
    for i, (lo1, hi1) in enumerate(edges):
        for lo2, hi2 in edges[i + 1 :]:
            a1, b1 = (lo1 if lo1 is not None else neg,
                      hi1 if hi1 is not None else pos)
            a2, b2 = (lo2 if lo2 is not None else neg,
                      hi2 if hi2 is not None else pos)
            if max(a1, a2) < min(b1, b2):
                raise ValueError(
                    "es_dsl: overlapping range buckets are unsupported"
                )
    whens, orders = [], []
    for i, ((lo, hi), r) in enumerate(zip(edges, ranges)):
        conds = []
        if lo is not None:
            conds.append(f"{f} >= {_lit(lo, dialect)}")
        if hi is not None:
            conds.append(f"{f} < {_lit(hi, dialect)}")
        # ES keyed ranges: an explicit per-range "key" names the bucket
        label = r.get(
            "key", f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        )
        label = str(label).replace("'", "''")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{label}'")
        orders.append(f"WHEN {' AND '.join(conds)} THEN {i}")
    case = "CASE " + " ".join(whens) + " END"
    ordinal = "CASE " + " ".join(orders) + " ELSE 999 END"
    return case, ordinal


def compile_aggs(
    index: str, body: dict, dialect: str, id_field: str = "doc_id",
    relations: dict | None = None,
) -> str:
    """Compile an aggregation body: one top-level bucket agg (terms /
    date_histogram / histogram / disjoint range / significant_terms)
    with metric sub-aggs, one optional nested BUCKET sub-level
    (metrics then sit on the inner buckets), all under an optional
    query-context filter."""
    if dialect not in ("spark", "duck"):
        raise ValueError(f"es_dsl: unknown dialect {dialect!r}")
    where = _query_expr(
        body.get("query", {"match_all": {}}), dialect, id_field, relations
    )
    # sibling pipeline aggs (avg_bucket & co) sit BESIDE the bucket agg
    # at the top level and consume its buckets via "parent>path"
    siblings = {n: sp for n, sp in body["aggs"].items()
                if set(sp) & _SIBLING_PIPELINE}
    parents = {n: sp for n, sp in body["aggs"].items() if n not in siblings}
    agg_name, spec = _one(parents, "aggs")
    sub = spec.get("aggs", {})
    bucket_kinds = [k for k in spec if k != "aggs"]
    if len(bucket_kinds) != 1:
        raise ValueError("es_dsl: exactly one bucket agg per level")
    kind = bucket_kinds[0]
    b = spec[kind]
    key = f"{agg_name}_key"

    if siblings and kind not in ("date_histogram", "histogram"):
        # ES allows siblings of any bucket agg; here the enumerable
        # histogram-family relation is the supported consumer — reject
        # the rest rather than silently mis-scope the statistic
        raise ValueError(
            "es_dsl: sibling pipeline aggs need a histogram-family parent"
        )
    if kind in ("significant_terms", "significant_text"):
        # significant_text IS significant_terms here: the engine's one
        # analysis model already tokenizes the field inside
        # _compile_significant_terms, which is exactly what ES's
        # text-typed variant does (ES splits the two kinds by field
        # mapping, a distinction this schema-driven engine lacks)
        if sub:
            raise ValueError(f"es_dsl: {kind} takes no sub-aggs")
        bad = set(b) - {"field", "size", "min_doc_count"}
        if kind == "significant_text":
            if b.get("filter_duplicate_text"):
                raise ValueError(
                    "es_dsl: significant_text filter_duplicate_text is "
                    "unsupported (near-dup suppression lives in "
                    "operators/dedup.py)"
                )
            bad -= {"filter_duplicate_text"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported {kind} keys {sorted(bad)}"
            )
        return _compile_significant_terms(
            index, b, where, key, dialect
        )
    if kind == "adjacency_matrix":
        if sub:
            raise ValueError(
                "es_dsl: adjacency_matrix sub-aggs are unsupported "
                "(doc_count per filter/intersection only)"
            )
        return _compile_adjacency_matrix(index, b, where, key, dialect,
                                         id_field)
    if kind == "composite":
        return _compile_composite(index, b, sub, where, dialect)
    if kind == "filters":
        return _compile_filters(index, b, sub, where, key, dialect, id_field)

    # split sub-aggs: at most one nested bucket; top_hits is its own
    # shape; pipeline aggs wrap the bucket result; the rest are metrics
    inner = [(n, sp) for n, sp in sub.items()
             if set(sp) & _BUCKETS or "aggs" in sp]
    top_hits = [(n, sp) for n, sp in sub.items() if "top_hits" in sp]
    pipelines = [(n, sp) for n, sp in sub.items()
                 if (n, sp) not in inner and set(sp) & _PIPELINE]
    rowlocal = [(n, sp) for n, sp in sub.items()
                if (n, sp) not in inner and set(sp) & _ROWLOCAL_PIPELINE]
    mads = [(n, sp) for n, sp in sub.items()
            if (n, sp) not in inner and "median_absolute_deviation" in sp]
    rates = [(n, sp) for n, sp in sub.items()
             if (n, sp) not in inner and "rate" in sp]
    normalizes = [(n, sp) for n, sp in sub.items()
                  if (n, sp) not in inner and "normalize" in sp]
    bsorts = [(n, sp) for n, sp in sub.items()
              if (n, sp) not in inner and "bucket_sort" in sp]
    cumcards = [(n, sp) for n, sp in sub.items()
                if (n, sp) not in inner and "cumulative_cardinality" in sp]
    metric_specs = [
        (n, sp) for n, sp in sub.items()
        if (n, sp) not in inner and (n, sp) not in top_hits
        and (n, sp) not in pipelines and (n, sp) not in rowlocal
        and (n, sp) not in mads and (n, sp) not in rates
        and (n, sp) not in normalizes and (n, sp) not in bsorts
        and (n, sp) not in cumcards
    ]
    if (normalizes or bsorts) and kind not in (
        "terms", "date_histogram", "histogram"
    ):
        raise ValueError(
            "es_dsl: normalize/bucket_sort need a terms or "
            "histogram-family parent"
        )
    if len(bsorts) > 1:
        raise ValueError("es_dsl: at most one bucket_sort per level")
    if cumcards:
        # the running count of DISTINCT values needs the raw rows
        # (which bucket saw each value FIRST) — a dedicated two-
        # aggregation path, like MAD
        if (kind not in ("date_histogram", "histogram") or pipelines
                or rowlocal or normalizes or bsorts or len(cumcards) > 1):
            raise ValueError(
                "es_dsl: cumulative_cardinality needs a histogram-"
                "family parent and composes with plain metric "
                "sub-aggs only"
            )
        metric_sql2 = _metric_list(metric_specs, dialect, id_field)
        if rates:
            metric_sql2 += _rate_cols(rates, kind, b, dialect)
        return _compile_cumulative_cardinality(
            index, b, kind, cumcards[0], metric_sql2, sub, where, key,
            dialect,
        )
    if mads:
        # median-of-|x - bucket median| needs the bucket's own median
        # as an input — a second aggregation pass over the same scan,
        # its own compile path (like top_hits, it owns the relation)
        if kind != "terms" or len(mads) > 1 or len(sub) != 1:
            raise ValueError(
                "es_dsl: median_absolute_deviation must be the only "
                "sub-agg of a terms bucket (it joins the bucket median "
                "back against the rows)"
            )
        return _compile_mad(index, b, mads[0], where, key, dialect)
    if rowlocal and kind not in (
        "terms", "multi_terms", "date_histogram", "histogram"
    ):
        raise ValueError(
            "es_dsl: bucket_script/bucket_selector need a terms, "
            "multi_terms, or histogram-family parent"
        )
    if top_hits:
        if kind != "terms":
            raise ValueError("es_dsl: top_hits only under terms")
        if len(top_hits) > 1 or inner or pipelines or metric_specs:
            raise ValueError(
                "es_dsl: top_hits must be the only sub-agg of its bucket"
            )
        return _compile_top_hits(
            index, b, top_hits[0], where, key, dialect, id_field
        )
    metric_sql = _metric_list(metric_specs, dialect, id_field)
    if rates:
        metric_sql += _rate_cols(rates, kind, b, dialect)
    metrics = (
        "" if not metric_sql else ",\n       " + ",\n       ".join(metric_sql)
    )

    if inner:
        if pipelines:
            raise ValueError(
                "es_dsl: pipeline aggs cannot combine with nested buckets"
            )
        if len(inner) > 1:
            raise ValueError("es_dsl: at most one nested bucket per level")
        if kind != "terms":
            raise ValueError("es_dsl: nested buckets only under terms")
        return _compile_nested(
            index, b, inner[0], metrics, where, key, dialect
        )

    if kind in ("sampler", "diversified_sampler"):
        # ES sampler: sub-aggs run over a BOUNDED sample of matching
        # docs instead of all of them. ES samples the top shard_size
        # by relevance; this filter-context engine has no score, so
        # the sample is the first shard_size docs by id — the
        # documented deterministic choice (same discipline as every
        # LIMIT in the module). diversified_sampler additionally caps
        # docs per distinct field value BEFORE the size cap
        # (de-duplication bias control); docs missing the diversity
        # field are excluded, the bucket NULL rule. Scale shape: the
        # id order is a TakeOrdered over the filtered scan, the
        # diversity rank one window partitioned by the field — then
        # every sub-agg runs on <= shard_size rows.
        known = {"shard_size"} if kind == "sampler" else {
            "shard_size", "field", "max_docs_per_value"}
        bad = set(b) - known
        if bad:
            raise ValueError(
                f"es_dsl: unsupported {kind} keys {sorted(bad)}"
            )
        shard_size = int(b.get("shard_size", 100))
        if shard_size < 1:
            raise ValueError("es_dsl: shard_size must be >= 1")
        if kind == "sampler":
            sample = f"""sample AS (
  SELECT * FROM {_ident(index)}
  WHERE {where}
  ORDER BY {id_field} ASC
  LIMIT {shard_size}
)"""
        else:
            f = _ident(b["field"])
            per = int(b.get("max_docs_per_value", 1))
            if per < 1:
                raise ValueError(
                    "es_dsl: max_docs_per_value must be >= 1"
                )
            sample = f"""ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {f} ORDER BY {id_field} ASC) AS _divrank
  FROM {_ident(index)}
  WHERE ({where}) AND {f} IS NOT NULL
),
sample AS (
  SELECT * FROM ranked WHERE _divrank <= {per}
  ORDER BY {id_field} ASC
  LIMIT {shard_size}
)"""
        return f"""
WITH {sample}
SELECT count(*) AS doc_count{metrics}
FROM sample
"""
    if kind == "missing":
        # ES missing agg: ONE bucket of docs lacking the field
        if set(b) != {"field"}:
            raise ValueError("es_dsl: missing takes only a field")
        return f"""
SELECT count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {_ident(b["field"])} IS NULL
"""
    if kind == "filter":
        # ES filter agg: ONE bucket under an extra filter clause —
        # the body of the agg IS the query clause
        sub_where = _query_expr(b, dialect, id_field)
        return f"""
SELECT count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND coalesce({sub_where}, FALSE)
"""
    if kind == "global":
        # ES global agg: ONE bucket over the WHOLE index, ignoring the
        # search query — the "compare against everything" idiom
        if b != {}:
            raise ValueError("es_dsl: global takes an empty body")
        return f"""
SELECT count(*) AS doc_count{metrics}
FROM {_ident(index)}
"""
    if kind == "terms":
        if pipelines:
            # ES requires a histogram-family parent for these — terms
            # bucket order (by count) has no "previous bucket" meaning
            raise ValueError(
                "es_dsl: pipeline aggs need a histogram-family parent"
            )
        bad = set(b) - {"field", "size", "order", "missing",
                        "min_doc_count", "include", "exclude"}
        if bad:
            raise ValueError(f"es_dsl: unsupported terms keys {sorted(bad)}")
        key_expr, _ = _bucket_key("terms", b, dialect)
        size = int(b.get("size", 10))
        having = ""
        if int(b.get("min_doc_count", 1)) > 1:
            having = f"\nHAVING count(*) >= {int(b['min_doc_count'])}"
        # ES terms include/exclude: regex (string, FULL-match as in
        # Lucene) or exact-value list filters on the bucket KEY —
        # pushed into the WHERE so excluded keys never aggregate
        key_filter = ""
        for param, keep in (("include", True), ("exclude", False)):
            if param not in b:
                continue
            v = b[param]
            if isinstance(v, str):
                if "'" in v or "\\" in v:
                    raise ValueError(
                        f"es_dsl: terms {param} regex may not contain "
                        "quotes or backslashes (escapes parse "
                        "differently across dialects)"
                    )
                # Lucene include/exclude regexes are FULL-match;
                # Spark rlike is partial -> anchor there
                cond = (
                    f"regexp_full_match({key_expr}, '{v}')"
                    if dialect == "duck"
                    else f"rlike({key_expr}, '^(?:{v})$')"
                )
            elif isinstance(v, list) and v and all(
                isinstance(x, (str, int, float)) and not isinstance(x, bool)
                for x in v
            ):
                vals = ", ".join(_lit(x, dialect) for x in v)
                cond = f"{key_expr} IN ({vals})"
            else:
                raise ValueError(
                    f"es_dsl: terms {param} wants a regex string or a "
                    "value list"
                )
            key_filter += f" AND {cond}" if keep else f" AND NOT {cond}"
        # ES terms `order`: _count (the default), _key, or a sibling
        # metric name; non-key orders carry the key tiebreak so the
        # top-N window stays total
        simple = {
            n for n, sp in metric_specs
            if next(iter(sp)) not in _MULTI_COLUMN_METRICS
        }
        oby = f"doc_count DESC, {key} ASC"
        if "order" in b:
            target, d = _one(b["order"], "terms order")
            d = d.lower() if isinstance(d, str) else d
            if d not in ("asc", "desc"):
                raise ValueError(f"es_dsl: bad terms order {d!r}")
            if target == "_key":
                oby = f"{key} {d.upper()}"
            elif target == "_count":
                oby = f"doc_count {d.upper()}, {key} ASC"
            elif target in simple:
                oby = f"{target} {d.upper()}, {key} ASC"
            else:
                raise ValueError(
                    f"es_dsl: terms order target {target!r} is neither "
                    "_key, _count, nor a sibling single-value metric"
                )
        sql = f"""
SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND ({key_expr}) IS NOT NULL{key_filter}
GROUP BY {key_expr}{having}
ORDER BY {oby}
LIMIT {size}
"""
        if rowlocal:
            # ES applies size truncation at collection, THEN pipeline
            # aggs run on the returned buckets — so the script/selector
            # wrap sits OUTSIDE the top-N limit
            sql = _wrap_rowlocal(sql, rowlocal, simple, oby)
        if normalizes or bsorts:
            avail = simple | {n for n, sp in rowlocal
                              if "bucket_script" in sp}
            sql = _apply_unordered(sql, normalizes, bsorts, avail, key)
        return sql
    if kind == "multi_terms":
        return _compile_multi_terms(
            index, b, metric_specs, metrics, rowlocal, where, dialect
        )
    if kind == "auto_date_histogram":
        if pipelines or rowlocal:
            raise ValueError(
                "es_dsl: pipeline aggs under auto_date_histogram are "
                "unsupported (the interval is data-chosen; use "
                "date_histogram with fixed_interval)"
            )
        return _compile_auto_date_histogram(
            index, b, metrics, where, key, dialect
        )
    if kind == "matrix_stats":
        # ES matrix_stats: pairwise covariance/correlation across N
        # numeric fields. Relational shape: one row per unordered
        # field pair (diagonal included — its covariance IS the
        # variance), columns field_a/field_b/n_rows/covariance/
        # correlation. Float discipline: inputs quantize to
        # DECIMAL(18,6), the sums of products are EXACT decimals, and
        # covariance/correlation form from those sums in identical
        # double arithmetic — partial-aggregation order can never flip
        # a bit. The PRODUCT operands are DECIMAL(18,6), NOT the
        # module _DEC(28,6): (28,6)x(28,6) needs precision 57, which
        # overflows the 38-digit cap — Spark silently reduces the
        # product to DECIMAL(38,6) and ROUNDS it to 6dp while DuckDB
        # clamps to DECIMAL(38,12), a cross-engine divergence for any
        # field with >3 decimal places. The exact width is per
        # dialect: Spark (18,6)x(18,6) -> (37,12) fits the cap, but
        # DuckDB MULTIPLIES DECIMAL(<=18) in int64 physical storage
        # and overflows on real magnitudes (caught live at sf0.01:
        # 82612.09^2), so it gets (19,6) operands -> int128 ->
        # DECIMAL(38,12). Same quantization (scale 6), same exact
        # product value, both engines. One scan, one aggregate row, a
        # constant-size VALUES-join fan-out.
        if sub or pipelines or rowlocal:
            raise ValueError("es_dsl: matrix_stats takes no sub-aggs")
        bad = set(b) - {"fields"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported matrix_stats keys {sorted(bad)}"
            )
        fields = b.get("fields")
        if (
            not isinstance(fields, list) or not 2 <= len(fields) <= 6
            or len(set(fields)) != len(fields)
        ):
            raise ValueError(
                "es_dsl: matrix_stats wants 2-6 distinct fields"
            )
        cols = [_ident(f) for f in fields]
        # exact sums per field and per pair over one aggregate
        # product operand width: see the float-discipline note above
        _pdec = "DECIMAL(18, 6)" if dialect == "spark" else "DECIMAL(19, 6)"
        sums, pair_rows = [], []
        for i, a in enumerate(cols):
            sums.append(f"sum(cast({a} AS {_pdec})) AS s_{a}")
            sums.append(
                f"sum(cast({a} AS {_pdec}) * cast({a} AS {_pdec}))"
                f" AS ss_{a}_{a}"
            )
            for j in range(i + 1, len(cols)):
                bcol = cols[j]
                sums.append(
                    f"sum(cast({a} AS {_pdec}) * cast({bcol} AS {_pdec}))"
                    f" AS ss_{a}_{bcol}"
                )
        def cov(x, y):
            return (
                f"(cast(ss_{x}_{y} AS DOUBLE)"
                f" - cast(s_{x} AS DOUBLE) * cast(s_{y} AS DOUBLE) / n)"
                f" / (n - 1)"
            )
        for i, a in enumerate(cols):
            for j in range(i, len(cols)):
                bcol = cols[j]
                c = cov(a, bcol)
                if i == j:
                    corr = "cast(1.0 AS DOUBLE)"
                else:
                    corr = (
                        f"round(({c}) / (sqrt({cov(a, a)})"
                        f" * sqrt({cov(bcol, bcol)})), 6)"
                    )
                pair_rows.append(
                    f"SELECT '{a}' AS field_a, '{bcol}' AS field_b,"
                    f" n AS n_rows, round({c}, 4) AS covariance,"
                    f" {corr} AS correlation FROM agg"
                )
        union = "\n  UNION ALL ".join(pair_rows)
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        return f"""
WITH agg AS (
  SELECT cast(count(*) AS DOUBLE) AS n, {', '.join(sums)}
  FROM {_ident(index)}
  WHERE ({where}) AND {notnull}
)
SELECT * FROM (
  {union}
) m
ORDER BY field_a ASC, field_b ASC
"""
    if kind == "geotile_grid":
        # ES geotile_grid: map-tile buckets keyed "z/x/y" (the slippy-
        # map scheme Kibana maps request). The tile indices are pure
        # floor arithmetic over web-mercator projection — one GROUP BY
        # on a derived string key, top-N by doc_count, metrics compose
        # as on terms. Scale shape: identical to a terms agg (partial
        # agg -> TakeOrdered); precision bounds the key cardinality at
        # 4^z regardless of row count.
        if pipelines or rowlocal:
            raise ValueError(
                "es_dsl: pipeline aggs under geotile_grid are unsupported"
            )
        bad = set(b) - {"field", "precision", "size"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported geotile_grid keys {sorted(bad)}"
            )
        z = b.get("precision", 7)
        if not isinstance(z, int) or isinstance(z, bool) or not 0 <= z <= 29:
            raise ValueError(
                "es_dsl: geotile_grid precision must be an int in [0, 29]"
            )
        lat, lon = _geo_cols(b["field"])
        n = 2 ** z
        sv = "string" if dialect == "spark" else "varchar"
        xe = (
            f"least(greatest(cast(floor(({lon} + 180.0) / 360.0 * {n})"
            f" AS BIGINT), 0), {n - 1})"
        )
        ye = (
            f"least(greatest(cast(floor((1.0 - ln(tan(radians({lat}))"
            f" + 1.0 / cos(radians({lat}))) / pi()) / 2.0 * {n})"
            f" AS BIGINT), 0), {n - 1})"
        )
        key_expr = (
            f"concat('{z}/', cast({xe} AS {sv}), '/', cast({ye} AS {sv}))"
        )
        size = int(b.get("size", 10000))
        return f"""
SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {lat} IS NOT NULL AND {lon} IS NOT NULL
GROUP BY {key_expr}
ORDER BY doc_count DESC, {key} ASC
LIMIT {size}
"""
    if kind == "rare_terms":
        # ES rare_terms: the long tail — buckets whose doc_count is at
        # most max_doc_count, ordered rarest first. No size param (the
        # rarity cap bounds the result); one GROUP BY + HAVING
        if pipelines:
            raise ValueError(
                "es_dsl: pipeline aggs need a histogram-family parent"
            )
        bad = set(b) - {"field", "max_doc_count"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported rare_terms keys {sorted(bad)}"
            )
        mdc = int(b.get("max_doc_count", 1))
        if not 1 <= mdc <= 100:
            raise ValueError(
                "es_dsl: rare_terms max_doc_count must be in [1, 100]"
            )
        f = _ident(b["field"])
        return f"""
SELECT {f} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {f} IS NOT NULL
GROUP BY {f}
HAVING count(*) <= {mdc}
ORDER BY doc_count ASC, {key} ASC
"""
    key_expr, order_expr = _bucket_key(kind, b, dialect)
    if kind in ("range", "date_range", "geo_distance"):
        if pipelines:
            raise ValueError(
                "es_dsl: pipeline aggs need a histogram-family parent"
            )
        return f"""
SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND ({key_expr}) IS NOT NULL
GROUP BY {key_expr}, {order_expr}
ORDER BY {order_expr} ASC
"""
    mdc = int(b.get("min_doc_count", 1))
    having = f"\nHAVING count(*) >= {mdc}" if mdc > 1 else ""
    if "min_doc_count" in b and mdc == 0:
        # the EXPLICIT Kibana default: a zero-filled bucket axis
        if kind == "histogram":
            base = _zero_fill_histogram(
                index, b, metric_specs, metrics, where, key, key_expr,
                dialect,
            )
        elif kind != "date_histogram":
            raise ValueError(
                "es_dsl: min_doc_count 0 (zero-filled axis) is "
                "supported for date_histogram and histogram only"
            )
        else:
            base = _zero_fill_date_histogram(
                index, b, metric_specs, metrics, where, key, key_expr,
                dialect,
            )
    else:
        base = f"""SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND ({key_expr}) IS NOT NULL
GROUP BY {key_expr}{having}"""
    simple = {n for n, sp in metric_specs
              if next(iter(sp)) not in _MULTI_COLUMN_METRICS}
    # selector/script/normalize/sort paths may also name a
    # window-pipeline output (ES: buckets_path can target any sibling
    # agg); multi-column siblings are not addressable
    avail = (
        simple
        | {n for n, sp in pipelines
           if next(iter(sp)) != "moving_percentiles"}  # multi-column
        | {n for n, sp in siblings.items()
           if next(iter(sp)) not in _MULTI_COLUMN_SIBLINGS}
    )
    if pipelines or siblings:
        sql = _wrap_pipelines(base, pipelines, siblings, key, simple,
                              agg_name, dialect)
        if rowlocal:
            sql = _wrap_rowlocal(sql, rowlocal, avail, f"{key} ASC")
    elif rowlocal:
        sql = _wrap_rowlocal(f"\n{base}\n", rowlocal, simple, f"{key} ASC")
    else:
        sql = f"\n{base}\nORDER BY {key} ASC\n"
    if normalizes or bsorts:
        avail = avail | {n for n, sp in rowlocal if "bucket_script" in sp}
        sql = _apply_unordered(sql, normalizes, bsorts, avail, key)
    return sql


def _resolve_bucket_col(path, avail: set[str], key: str, what: str,
                        allow_key: bool = False) -> str:
    """Resolve a buckets_path/sort target on an aggregated bucket
    relation: `_count` = doc_count, optionally `_key`, else a
    single-column sibling name."""
    if path == "_count":
        return "doc_count"
    if allow_key and path == "_key":
        return key
    if not isinstance(path, str) or path not in avail:
        raise ValueError(
            f"es_dsl: {what} target {path!r} names no single-value "
            "sibling (multi-column metrics/siblings cannot be a target)"
        )
    return _ident(path)


def _apply_unordered(
    sql: str, normalizes: list[tuple[str, dict]],
    bsorts: list[tuple[str, dict]], avail: set[str], key: str,
) -> str:
    """ES `normalize` and `bucket_sort` pipelines: both run on the
    RETURNED buckets (post top-N, like every pipeline), need no bucket
    ordering, and compose with terms parents — normalize adds
    whole-relation rescale columns, bucket_sort re-sorts/truncates the
    bucket list and runs OUTERMOST (it sees normalize outputs, as in
    ES's dependency-ordered pipeline execution). Scale shape: both
    wrap the aggregated bucket relation — bucket-cardinality rows,
    never the corpus."""
    if normalizes:
        cols = []
        for name, spec in normalizes:
            if set(spec) != {"normalize"}:
                raise ValueError("es_dsl: normalize takes no sibling keys")
            p = spec["normalize"]
            bad = set(p) - {"buckets_path", "method"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported normalize keys {sorted(bad)}"
                )
            path = _resolve_bucket_col(
                p.get("buckets_path"), avail, key, "normalize"
            )
            method = p.get("method")
            n = _ident(name)
            # whole-relation sums follow the DECIMAL discipline (the
            # engines frame-sum in different row orders); min/max are
            # order-independent as-is
            dsum = f"cast(sum(cast({path} AS {_DEC})) OVER () AS DOUBLE)"
            if method == "percent_of_sum":
                cols.append(f"100.0 * {path} / {dsum} AS {n}")
            elif method in ("rescale_0_1", "rescale_0_100"):
                mn = f"min({path}) OVER ()"
                mx = f"max({path}) OVER ()"
                scale = "100.0 * " if method == "rescale_0_100" else ""
                # single-bucket relation: 0/0 -> NULL (no defined range)
                cols.append(
                    f"{scale}({path} - {mn})"
                    f" / nullif(cast({mx} - {mn} AS DOUBLE), 0) AS {n}"
                )
            else:
                raise ValueError(
                    f"es_dsl: unsupported normalize method {method!r} "
                    "(percent_of_sum / rescale_0_1 / rescale_0_100; "
                    "mean/z-score/softmax are not compiled)"
                )
            avail = avail | {name}
        ncols = ",\n       ".join(cols)
        sql = f"""
SELECT b.*,
       {ncols}
FROM (
{sql}
) b
ORDER BY {key} ASC
"""
    if bsorts:
        name, spec = bsorts[0]
        if set(spec) != {"bucket_sort"}:
            raise ValueError("es_dsl: bucket_sort takes no sibling keys")
        p = spec["bucket_sort"]
        bad = set(p) - {"sort", "from", "size", "gap_policy"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported bucket_sort keys {sorted(bad)}"
            )
        if p.get("gap_policy", "skip") != "skip":
            raise ValueError(
                "es_dsl: bucket_sort supports gap_policy skip only"
            )
        sorts = p.get("sort", [])
        if isinstance(sorts, (str, dict)):
            sorts = [sorts]
        order: list[str] = []
        for s_ in sorts:
            if isinstance(s_, str):
                f_, d_ = s_, "asc"
            else:
                f_, dspec = _one(s_, "bucket_sort sort entry")
                d_ = (dspec if isinstance(dspec, str)
                      else dspec.get("order", "asc"))
            if d_ not in ("asc", "desc"):
                raise ValueError(f"es_dsl: bad bucket_sort order {d_!r}")
            col = _resolve_bucket_col(f_, avail, key, "bucket_sort",
                                      allow_key=True)
            # explicit NULLS LAST: the engines' defaults differ (Spark
            # ASC puts NULLs first, DuckDB last)
            order.append(f"{col} {d_.upper()} NULLS LAST")
        order.append(f"{key} ASC")  # total order under LIMIT
        offset = int(p.get("from", 0))
        if "size" not in p and offset:
            raise ValueError(
                "es_dsl: bucket_sort from without size is unsupported"
            )
        limit = f"\nLIMIT {int(p['size'])}" if "size" in p else ""
        off = f" OFFSET {offset}" if offset else ""
        sql = f"""
SELECT * FROM (
{sql}
) bsorted
ORDER BY {', '.join(order)}{limit}{off}
"""
    return sql


def _wrap_pipelines(
    base: str, pipelines: list[tuple[str, dict]],
    siblings: dict[str, dict], key: str,
    metric_names: set[str], parent_name: str, dialect: str = "spark",
) -> str:
    """ES pipeline aggregations over a histogram-family parent:
    PARENT pipelines (cumulative_sum / derivative of a sibling metric,
    ``buckets_path``, ``_count`` = doc_count) as ordered window
    functions, and SIBLING pipelines (avg/sum/min/max_bucket with the
    ES ``parent>path`` buckets_path) as whole-relation windows — ES
    reports a sibling as one scalar beside the buckets; the relational
    rendering is that scalar as a constant column on every bucket row.

    Determinism: the running sum accumulates in the window's total
    ORDER BY (bucket key, unique per bucket) — a sequential
    prefix-scan, the same additions in the same order in both engines,
    so no rounding is needed on top of the parent metric's own
    discipline. Scale shape: every window runs on the AGGREGATED
    bucket relation (bucket-cardinality rows), never the raw corpus;
    the single-partition window is bounded by bucket count, not data
    size."""

    def resolve(path: str | None, what: str) -> str:
        if path == "_count":
            return "doc_count"
        if path not in metric_names:
            raise ValueError(
                f"es_dsl: {what} buckets_path {path!r} names no "
                "single-value sibling metric (multi-column metrics — "
                "stats/extended_stats/percentiles/percentile_ranks — "
                "cannot be a buckets_path)"
            )
        return path

    cols: list[str] = []
    for name, spec in pipelines:
        pkind, p = _one(spec, f"pipeline agg {name}")
        path = resolve(p.get("buckets_path"), pkind)
        n = _ident(name)
        # cast: DuckDB widens sum(BIGINT) to HUGEINT; metric paths are
        # already DOUBLE (a no-op cast) — the types must agree
        ctype = "BIGINT" if path == "doc_count" else "DOUBLE"
        if pkind == "cumulative_sum":
            cols.append(
                f"cast(sum({path}) OVER (ORDER BY {key} ASC"
                f" ROWS UNBOUNDED PRECEDING) AS {ctype}) AS {n}"
            )
        elif pkind == "derivative":
            # NULL for the first bucket, as in ES
            cols.append(
                f"{path} - lag({path}) OVER (ORDER BY {key} ASC) AS {n}"
            )
        elif pkind == "serial_diff":
            lag = int(p.get("lag", 1))
            if lag < 1:
                raise ValueError("es_dsl: serial_diff lag must be >= 1")
            cols.append(
                f"{path} - lag({path}, {lag}) OVER (ORDER BY {key} ASC)"
                f" AS {n}"
            )
        elif pkind == "moving_percentiles":
            # exact interpolated quantiles over a sliding bucket frame
            # (ES's is TDigest-approximate) — the moving_fn frame
            # semantics, the percentiles naming/DECIMAL discipline
            bad = set(p) - {"buckets_path", "window", "shift", "percents"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported moving_percentiles keys "
                    f"{sorted(bad)}"
                )
            w = int(p.get("window", 0))
            if w < 1:
                raise ValueError(
                    "es_dsl: moving_percentiles window must be >= 1"
                )
            shift = int(p.get("shift", 0))
            if shift == 0:
                frame = f"ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING"
            elif shift == 1:
                frame = f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW"
            else:
                raise ValueError(
                    f"es_dsl: unsupported moving_percentiles shift "
                    f"{shift} (0 = exclude current bucket, 1 = include)"
                )
            percents = p.get("percents", [1, 5, 25, 50, 75, 95, 99])
            if not isinstance(percents, list) or not percents or not all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                and 0 <= x <= 100 for x in percents
            ):
                raise ValueError(
                    "es_dsl: percents must be numbers in [0, 100]"
                )
            over = f"OVER (ORDER BY {key} ASC {frame})"
            pfn = "percentile" if dialect == "spark" else "quantile_cont"
            for pc in percents:
                q = repr(pc / 100.0)
                label = (f"{pc:g}").replace(".", "_").replace("-", "m")
                cols.append(
                    f"cast(cast({pfn}({path}, {q}) {over}"
                    f" AS DECIMAL(18, 6)) AS DOUBLE) AS {n}_p{label}"
                )
        else:  # moving_fn
            bad = set(p) - {"buckets_path", "window", "script", "shift"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported moving_fn keys {sorted(bad)}"
                )
            w = int(p.get("window", 0))
            if w < 1:
                raise ValueError("es_dsl: moving_fn window must be >= 1")
            m = re.fullmatch(
                r"MovingFunctions\.(unweightedAvg|sum|min|max)\(values\)",
                str(p.get("script", "")).strip(),
            )
            if not m:
                raise ValueError(
                    "es_dsl: moving_fn supports exactly the stock "
                    "MovingFunctions.{unweightedAvg|sum|min|max}(values) "
                    f"scripts (got {p.get('script')!r})"
                )
            shift = int(p.get("shift", 0))
            # ES shift semantics: 0 (default) = window is the w buckets
            # BEFORE the current one; 1 = slide right to include it
            if shift == 0:
                frame = f"ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING"
            elif shift == 1:
                frame = f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW"
            else:
                raise ValueError(
                    f"es_dsl: unsupported moving_fn shift {shift} "
                    "(0 = exclude current bucket, 1 = include)"
                )
            over = f"OVER (ORDER BY {key} ASC {frame})"
            mfn = m.group(1)
            # sliding-frame sums are order-INDEPENDENT only in the
            # exact-decimal domain (DuckDB evaluates frames via segment
            # trees — a different addition order than a sequential
            # scan), so sum/avg follow the module's DECIMAL discipline
            dsum = f"cast(sum(cast({path} AS {_DEC})) {over} AS DOUBLE)"
            if mfn == "sum":
                # MovingFunctions.sum of an EMPTY window is 0.0 in ES
                # (avg of empty is NaN -> null, min/max +-Inf -> null,
                # all matching SQL NULL)
                cols.append(f"coalesce({dsum}, 0.0) AS {n}")
            elif mfn == "unweightedAvg":
                cols.append(f"{dsum} / count({path}) {over} AS {n}")
            else:
                cols.append(f"cast({mfn}({path}) {over} AS DOUBLE) AS {n}")
    for name, spec in siblings.items():
        pkind, p = _one(spec, f"sibling pipeline agg {name}")
        bp = p.get("buckets_path")
        if not isinstance(bp, str) or ">" not in bp:
            raise ValueError(
                f"es_dsl: sibling buckets_path must be 'parent>path', "
                f"got {bp!r}"
            )
        pname, _, leaf = bp.partition(">")
        if pname != parent_name:
            raise ValueError(
                f"es_dsl: sibling buckets_path parent {pname!r} is not "
                f"the bucket agg {parent_name!r}"
            )
        path = resolve(leaf, pkind)
        n = _ident(name)
        if pkind == "stats_bucket":
            # ES stats_bucket: count/min/max/avg/sum over the parent's
            # buckets, one column each ({n}_count BIGINT, rest per the
            # sibling discipline below)
            if path == "doc_count":
                dsum = "cast(sum(doc_count) OVER () AS DOUBLE)"
                mm = "cast({f}(doc_count) OVER () AS BIGINT)"
                ssum = "cast(sum(doc_count) OVER () AS BIGINT)"
            else:
                dsum = f"cast(sum(cast({path} AS {_DEC})) OVER () AS DOUBLE)"
                mm = f"cast({{f}}({path}) OVER () AS DOUBLE)"
                ssum = dsum
            cols += [
                f"count({path}) OVER () AS {n}_count",
                f"{mm.format(f='min')} AS {n}_min",
                f"{mm.format(f='max')} AS {n}_max",
                f"{dsum} / count({path}) OVER () AS {n}_avg",
                f"{ssum} AS {n}_sum",
            ]
            continue
        if pkind == "percentiles_bucket":
            # ES percentiles_bucket: exact interpolated quantiles of a
            # parent metric ACROSS the buckets (ES default percents),
            # one {n}_p{label} column per percent — the percentiles
            # metric's naming and DECIMAL(18,6) discipline, evaluated
            # as whole-relation windows over the bucket relation
            percents = p.get("percents", [1, 5, 25, 50, 75, 95, 99])
            if not isinstance(percents, list) or not percents or not all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                and 0 <= x <= 100 for x in percents
            ):
                raise ValueError(
                    "es_dsl: percents must be numbers in [0, 100]"
                )
            pbad = set(p) - {"buckets_path", "percents"}
            if pbad:
                raise ValueError(
                    f"es_dsl: unsupported percentiles_bucket keys "
                    f"{sorted(pbad)}"
                )
            for pc in percents:
                q = repr(pc / 100.0)
                label = (f"{pc:g}").replace(".", "_").replace("-", "m")
                fnq = (
                    f"percentile({path}, {q})" if dialect == "spark"
                    else f"quantile_cont({path}, {q})"
                )
                cols.append(
                    f"cast(cast({fnq} OVER () AS DECIMAL(18, 6))"
                    f" AS DOUBLE) AS {n}_p{label}"
                )
            continue
        fn = pkind.split("_")[0]  # avg | sum | min | max
        # avg/sum over the UNORDERED whole-relation frame are
        # order-dependent on doubles (engines sum the frame in
        # different row orders — a last-ulp flip was caught live), so
        # they follow the module's DECIMAL discipline: exact-decimal
        # window sum, divide/emit as the raw IEEE double. min/max and
        # integer paths are order-independent as-is.
        if path == "doc_count":
            dsum = "cast(sum(doc_count) OVER () AS DOUBLE)"
            if fn == "sum":
                cols.append(
                    f"cast(sum(doc_count) OVER () AS BIGINT) AS {n}"
                )
            elif fn == "avg":
                cols.append(f"{dsum} / count(*) OVER () AS {n}")
            else:
                cols.append(
                    f"cast({fn}(doc_count) OVER () AS BIGINT) AS {n}"
                )
        else:
            dsum = f"cast(sum(cast({path} AS {_DEC})) OVER () AS DOUBLE)"
            if fn == "sum":
                cols.append(f"{dsum} AS {n}")
            elif fn == "avg":
                cols.append(f"{dsum} / count({path}) OVER () AS {n}")
            else:
                cols.append(f"cast({fn}({path}) OVER () AS DOUBLE) AS {n}")
    pipe = ",\n       ".join(cols)
    return f"""
SELECT b.*,
       {pipe}
FROM (
{base}
) b
ORDER BY {key} ASC
"""


# --- row-local pipeline aggs: bucket_script / bucket_selector ----------------




def _wrap_rowlocal(
    inner_sql: str,
    rowlocal: list[tuple[str, dict]],
    metric_names: set[str],
    oby: str,
) -> str:
    """bucket_script derived-metric columns and bucket_selector
    predicates over an already-aggregated bucket relation (the HAVING /
    computed-column idioms of real Kibana dashboard bodies). Two
    layers so a selector may reference a script output, as ES allows:
    scripts compute in the inner select, selectors filter outside, the
    parent's bucket order re-asserted on top. Scale shape: both run on
    the AGGREGATED relation (bucket-cardinality rows, post top-N),
    never the raw corpus — zero extra shuffles.

    gap_policy: only the ES default "skip" — a NULL metric makes a
    script column NULL and a selector predicate false (the bucket is
    dropped), exactly ES's skip; "insert_zeros"/"keep_values" raise."""
    script_cols: list[str] = []
    script_names: set[str] = set()
    selectors: list[str] = []

    def resolve(path, what: str, extra: set[str]) -> str:
        if path == "_count":
            return "doc_count"
        if path not in metric_names | extra:
            raise ValueError(
                f"es_dsl: {what} buckets_path {path!r} names no "
                "single-value sibling metric (multi-column metrics — "
                "stats/extended_stats/percentiles/percentile_ranks — "
                "cannot be a buckets_path)"
            )
        return _ident(path)

    for name, spec in rowlocal:
        pkind, p = _one(spec, f"pipeline agg {name}")
        bad = set(p) - {"buckets_path", "script", "gap_policy"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported {pkind} keys {sorted(bad)}"
            )
        if p.get("gap_policy", "skip") != "skip":
            raise ValueError(
                f"es_dsl: unsupported gap_policy "
                f"{p.get('gap_policy')!r} (only the ES default 'skip')"
            )
        bp = p.get("buckets_path")
        if not isinstance(bp, dict) or not bp:
            raise ValueError(
                f"es_dsl: {pkind} buckets_path must be a non-empty "
                "map of script param -> sibling metric"
            )
        # selectors resolve AFTER scripts, so they may name one
        extra = script_names if pkind == "bucket_selector" else set()
        params = {k: resolve(v, pkind, extra) for k, v in bp.items()}
        expr = _compile_script(p.get("script"), params, pkind)
        if pkind == "bucket_script":
            script_cols.append(f"cast({expr} AS DOUBLE) AS {_ident(name)}")
            script_names.add(name)
        else:
            selectors.append(f"coalesce({expr}, FALSE)")
    inner = f"SELECT * FROM (\n{inner_sql}\n) b0"
    if script_cols:
        inner = (
            "SELECT b0.*,\n       "
            + ",\n       ".join(script_cols)
            + f"\nFROM (\n{inner_sql}\n) b0"
        )
    if not selectors:
        return f"\nSELECT * FROM (\n{inner}\n) b1\nORDER BY {oby}\n"
    pred = "\n  AND ".join(selectors)
    return (
        f"\nSELECT * FROM (\n{inner}\n) b1\n"
        f"WHERE {pred}\nORDER BY {oby}\n"
    )


# --- multi_terms / auto_date_histogram bucket kinds ---------------------------


def _compile_multi_terms(
    index: str,
    b: dict,
    metric_specs: list[tuple[str, dict]],
    metrics: str,
    rowlocal: list[tuple[str, dict]],
    where: str,
    dialect: str,
) -> str:
    """ES `multi_terms`: terms over a compound key (>= 2 fields), one
    GROUP BY over all key fields. ES semantics kept: a doc missing ANY
    key field is excluded; default order is doc_count DESC with the
    full key tuple as tiebreak; `order` accepts _count, _key (the key
    tuple lexicographically), or a single-value sibling metric. The
    relational rendering emits one column per key field (named by the
    field) instead of ES's key array + '|'-joined key_as_string."""
    bad = set(b) - {"terms", "size", "order", "min_doc_count"}
    if bad:
        raise ValueError(f"es_dsl: unsupported multi_terms keys {sorted(bad)}")
    specs = b.get("terms")
    if not isinstance(specs, list) or len(specs) < 2:
        raise ValueError("es_dsl: multi_terms wants >= 2 term sources")
    fields = []
    for t in specs:
        if set(t) != {"field"}:
            raise ValueError(
                "es_dsl: multi_terms sources take only a field "
                f"(got {sorted(t)})"
            )
        fields.append(_ident(t["field"]))
    size = int(b.get("size", 10))
    having = ""
    if int(b.get("min_doc_count", 1)) > 1:
        having = f"\nHAVING count(*) >= {int(b['min_doc_count'])}"
    keys_asc = ", ".join(f"{f} ASC" for f in fields)
    simple = {n for n, sp in metric_specs
              if next(iter(sp)) not in _MULTI_COLUMN_METRICS}
    oby = f"doc_count DESC, {keys_asc}"
    if "order" in b:
        target, d = _one(b["order"], "multi_terms order")
        d = d.lower() if isinstance(d, str) else d
        if d not in ("asc", "desc"):
            raise ValueError(f"es_dsl: bad multi_terms order {d!r}")
        if target == "_key":
            oby = ", ".join(f"{f} {d.upper()}" for f in fields)
        elif target == "_count":
            oby = f"doc_count {d.upper()}, {keys_asc}"
        elif target in simple:
            oby = f"{target} {d.upper()}, {keys_asc}"
        else:
            raise ValueError(
                f"es_dsl: multi_terms order target {target!r} is neither "
                "_key, _count, nor a sibling single-value metric"
            )
    not_null = " AND ".join(f"{f} IS NOT NULL" for f in fields)
    sql = f"""
SELECT {", ".join(fields)}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {not_null}
GROUP BY {", ".join(fields)}{having}
ORDER BY {oby}
LIMIT {size}
"""
    if rowlocal:
        return _wrap_rowlocal(sql, rowlocal, simple, oby)
    return sql


# the ES auto_date_histogram interval ladder, rendered as FIXED second
# widths so both engines pick the identical interval from the identical
# integer-second span (ES uses calendar-aware intervals above hours;
# this deterministic rendering approximates month/quarter/year as
# 30/90/365 days — documented deviation, pinned by unit test)
_AUTO_DH_LADDER = [
    1, 5, 10, 30,                      # seconds
    60, 300, 600, 1800,                # minutes
    3600, 10800, 43200,                # hours
    86400, 604800,                     # day, week
    2592000, 7776000, 31536000,        # ~month, ~quarter, ~year
]


def _zero_fill_fills(metric_specs: list[tuple[str, dict]]) -> str:
    """ES empty-bucket metric values for a zero-filled axis:
    sum/value_count/cardinality 0, avg/min/max NULL; anything else
    raises (multi-column metrics have no defined empty shape here)."""
    fills = []
    for n, sp in metric_specs:
        mk = next(iter(sp))
        if mk in ("value_count", "cardinality"):
            fills.append(f"coalesce(b.{_ident(n)}, 0) AS {_ident(n)}")
        elif mk == "sum":
            fills.append(
                f"coalesce(b.{_ident(n)}, cast(0 AS DOUBLE)) AS {_ident(n)}"
            )
        elif mk in ("avg", "min", "max"):
            fills.append(f"b.{_ident(n)} AS {_ident(n)}")
        else:
            raise ValueError(
                f"es_dsl: min_doc_count 0 with {mk} metrics is "
                "unsupported (single-value metrics only)"
            )
    return "".join(",\n       " + c for c in fills)


def _zero_fill_histogram(
    index: str, b: dict, metric_specs: list[tuple[str, dict]],
    metrics: str, where: str, key: str, key_expr: str, dialect: str,
) -> str:
    """``min_doc_count: 0`` for NUMERIC histograms — the date axis's
    sibling: the contiguous bucket grid generated in-plan from the
    data's bucket ordinals (integer sequence, so a fractional
    `interval` still yields an exact axis), optionally widened by
    numeric ``extended_bounds``. Same scale shape as the date variant:
    axis rows = value span / interval, bounds is one aggregate row,
    the bucket relation broadcasts into the left join."""
    fill_cols = _zero_fill_fills(metric_specs)
    f = _ident(b["field"])
    step = b["interval"]
    off = b.get("offset", 0)
    eb = b.get("extended_bounds")
    lo = f"cast(floor((min({f}) - {off}) / {step}) AS BIGINT)"
    hi = f"cast(floor((max({f}) - {off}) / {step}) AS BIGINT)"
    if eb is not None:
        if (not isinstance(eb, dict) or set(eb) != {"min", "max"}
                or not all(isinstance(v, (int, float))
                           and not isinstance(v, bool)
                           for v in eb.values())):
            raise ValueError(
                "es_dsl: histogram extended_bounds wants numeric "
                "{min, max}"
            )
        elo = f"cast(floor(({eb['min']} - {off}) / {step}) AS BIGINT)"
        ehi = f"cast(floor(({eb['max']} - {off}) / {step}) AS BIGINT)"
        lo, hi = f"least({lo}, {elo})", f"greatest({hi}, {ehi})"
    axis_key = f"cast(round(i * {step} + {off}, 4) AS DOUBLE)"
    axis = (
        f"SELECT {axis_key} AS {key}\n"
        f"  FROM (SELECT explode(sequence(lo, hi, 1)) AS i FROM zf_bounds)"
        if dialect == "spark"
        else f"SELECT {axis_key} AS {key}\n"
        f"  FROM (SELECT unnest(generate_series(lo, hi, 1)) AS i"
        f" FROM zf_bounds)"
    )
    return f"""WITH zf_bounds AS (
  SELECT {lo} AS lo, {hi} AS hi
  FROM {_ident(index)} WHERE ({where}) AND {f} IS NOT NULL
),
zf_axis AS (
  {axis}
),
zf_buckets AS (
  SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL
  GROUP BY {key_expr}
)
SELECT a.{key} AS {key}, coalesce(b.doc_count, 0) AS doc_count{fill_cols}
FROM zf_axis a LEFT JOIN zf_buckets b ON a.{key} = b.{key}"""


def _zero_fill_date_histogram(
    index: str, b: dict, metric_specs: list[tuple[str, dict]],
    metrics: str, where: str, key: str, key_expr: str, dialect: str,
) -> str:
    """``min_doc_count: 0`` — the EXPLICIT default of Kibana-generated
    date_histogram bodies: the bucket axis is CONTIGUOUS, empty buckets
    appear with doc_count 0 (and ES's empty-bucket metric values:
    sum/value_count/cardinality 0, avg/min/max NULL). The axis is
    generated in-plan from the data's key bounds — optionally widened
    by ``extended_bounds`` {min,max} date strings, which only ever
    EXTEND (ES semantics: data outside the bounds still buckets) — as
    a sequence/generate_series relation left-joined to the aggregated
    buckets. Scale shape: the axis is bounded by bucket count (axis
    rows = time span / interval, never data size), the bounds relation
    is one aggregate row, and the join is a broadcast of the bucket
    relation; pipeline aggs composed on top run over the FILLED axis,
    which is exactly what makes derivative/moving windows correct
    across gaps."""
    fill_cols = _zero_fill_fills(metric_specs)
    f = _ident(b["field"])
    eb = b.get("extended_bounds")
    if eb is not None and (
        not isinstance(eb, dict) or set(eb) != {"min", "max"}
        or not all(isinstance(v, str) for v in eb.values())
    ):
        raise ValueError(
            "es_dsl: extended_bounds wants {min, max} date strings"
        )
    if "fixed_interval" in b:
        if eb:
            raise ValueError(
                "es_dsl: extended_bounds with fixed_interval is "
                "unsupported (calendar intervals only)"
            )
        mi = re.fullmatch(r"(\d+)([smhd])", str(b["fixed_interval"]))
        secs = int(mi.group(1)) * {
            "s": 1, "m": 60, "h": 3600, "d": 86400,
        }[mi.group(2)]
        step = secs * 1000
        axis = (
            f"SELECT explode(sequence(lo, hi, {step})) AS {key} FROM zf_bounds"
            if dialect == "spark"
            else f"SELECT unnest(generate_series(lo, hi, {step}))"
            f" AS {key} FROM zf_bounds"
        )
        bounds = (
            f"SELECT min({key_expr}) AS lo, max({key_expr}) AS hi\n"
            f"  FROM {_ident(index)} WHERE ({where}) AND {f} IS NOT NULL"
        )
    else:
        unit = b.get("calendar_interval", "day")
        n_step, u_step = {
            "day": (1, "day"), "week": (7, "day"),
            "month": (1, "month"), "year": (1, "year"),
        }[unit]
        lo, hi = f"min({key_expr})", f"max({key_expr})"
        if eb:
            # least/greatest ignore NULLs in both dialects, so an empty
            # relation still yields the bounds-only axis (ES: empty
            # buckets are forced across extended_bounds regardless)
            emin = f"cast(date_trunc('{unit}', DATE '{eb['min']}') AS DATE)"
            emax = f"cast(date_trunc('{unit}', DATE '{eb['max']}') AS DATE)"
            lo, hi = f"least({lo}, {emin})", f"greatest({hi}, {emax})"
        bounds = (
            f"SELECT {lo} AS lo, {hi} AS hi\n"
            f"  FROM {_ident(index)} WHERE ({where}) AND {f} IS NOT NULL"
        )
        axis = (
            f"SELECT explode(sequence(lo, hi, interval {n_step} {u_step}))"
            f" AS {key} FROM zf_bounds"
            if dialect == "spark"
            else f"SELECT cast(unnest(generate_series(lo, hi,"
            f" INTERVAL {n_step} {u_step})) AS DATE) AS {key}"
            f" FROM zf_bounds"
        )
    return f"""WITH zf_bounds AS (
  {bounds}
),
zf_axis AS (
  {axis}
),
zf_buckets AS (
  SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL
  GROUP BY {key_expr}
)
SELECT a.{key} AS {key}, coalesce(b.doc_count, 0) AS doc_count{fill_cols}
FROM zf_axis a LEFT JOIN zf_buckets b ON a.{key} = b.{key}"""


def _compile_auto_date_histogram(
    index: str, b: dict, metrics: str, where: str, key: str, dialect: str
) -> str:
    """ES `auto_date_histogram`: the engine picks the smallest ladder
    interval such that the bucket count cannot exceed `buckets`. The
    span (integer epoch seconds, identical truncation in both
    dialects) is computed in-plan as a 1-row relation and cross-joined
    back as a broadcast constant — two scans of the fact table, the
    honest cost of a data-chosen interval, no driver round-trip. The
    guarantee floor(span/i)+2 <= buckets (worst-case bucket count over
    a half-open span) is enforced as span < (buckets-1)*i. Key is the
    ES epoch-millis bucket key (the fixed_interval discipline); the
    chosen interval is emitted as `interval_secs` on every row, parity
    with the `interval` field of the ES response."""
    bad = set(b) - {"field", "buckets"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported auto_date_histogram keys {sorted(bad)}"
        )
    f = _ident(b["field"])
    target = int(b.get("buckets", 10))
    if not 2 <= target <= 1000:
        raise ValueError(
            "es_dsl: auto_date_histogram buckets must be in [2, 1000]"
        )
    # integer epoch seconds: Spark unix_timestamp truncates sub-second
    # parts; DuckDB epoch() keeps them — floor to agree exactly
    e = (f"unix_timestamp({f})" if dialect == "spark"
         else f"cast(floor(epoch({f})) AS BIGINT)")
    whens = "\n      ".join(
        f"WHEN span < {(target - 1) * i} THEN {i}" for i in _AUTO_DH_LADDER
    )
    return f"""
WITH espan AS (
  SELECT max({e}) - min({e}) AS span
  FROM {_ident(index)}
  WHERE ({where}) AND {f} IS NOT NULL
),
ival AS (
  SELECT CASE
      {whens}
      ELSE {_AUTO_DH_LADDER[-1] * 10}
    END AS secs
  FROM espan
)
SELECT cast(floor({e} / secs) * secs AS BIGINT) * 1000 AS {key},
       cast(secs AS BIGINT) AS interval_secs,
       count(*) AS doc_count{metrics}
FROM {_ident(index)} CROSS JOIN ival
WHERE ({where}) AND {f} IS NOT NULL
GROUP BY cast(floor({e} / secs) * secs AS BIGINT) * 1000, secs
ORDER BY {key} ASC
"""


def _compile_nested(
    index: str,
    outer_b: dict,
    inner_pair: tuple,
    metrics: str,
    where: str,
    outer_key: str,
    dialect: str,
) -> str:
    """terms -> nested bucket: one two-key aggregation over the
    filtered base (cells), outer terms size applied on TOTAL bucket
    counts (window over the cells, not a second scan), inner buckets
    ordered by their own rule. ES semantics: the outer top-N is chosen
    by doc_count across the whole bucket, then each kept bucket
    reports all its inner buckets.

    Scale shape: ONE partial+final aggregation over (k1, k2) — the
    window ranking runs on the aggregated cells (bucket-cardinality
    rows), never the raw corpus."""
    inner_name, inner_spec = inner_pair
    ikinds = [k for k in inner_spec if k != "aggs"]
    if len(ikinds) != 1 or ikinds[0] not in _BUCKETS:
        raise ValueError("es_dsl: nested sub-agg must be a bucket agg")
    if "min_doc_count" in (inner_spec.get(ikinds[0]) or {}):
        raise ValueError(
            "es_dsl: min_doc_count is supported on top-level buckets only"
        )
    deeper = [
        (n, sp) for n, sp in inner_spec.get("aggs", {}).items()
        if set(sp) & _BUCKETS or "aggs" in sp
    ]
    if deeper:
        if len(deeper) > 1:
            raise ValueError("es_dsl: at most one nested bucket per level")
        if metrics:
            raise ValueError(
                "es_dsl: metrics must sit on the innermost bucket level"
            )
        if [n for n, sp in inner_spec["aggs"].items() if (n, sp) not in deeper]:
            raise ValueError(
                "es_dsl: metrics must sit on the innermost bucket level"
            )
        return _compile_nested3(
            index, outer_b, (inner_name, inner_spec), deeper[0],
            where, outer_key, dialect,
        )
    # metrics live at the LEAF: recompute them from the inner spec
    leaf_metrics: list[str] = []
    for mn, msp in inner_spec.get("aggs", {}).items():
        mk, m = _one(msp, f"sub-agg {mn}")
        if mk not in _METRICS:
            raise ValueError(f"es_dsl: unsupported sub-agg {mk!r}")
        leaf_metrics += _metric_cols(_ident(mn), mk, m, dialect)
    if metrics:
        # ES would compute these per outer bucket; supporting both
        # levels doubles the aggregation shape — reject rather than
        # silently drop
        raise ValueError(
            "es_dsl: metrics must sit on the innermost bucket level"
        )
    mtxt = "" if not leaf_metrics else ",\n         " + ",\n         ".join(
        leaf_metrics
    )
    f1 = _ident(outer_b["field"])
    size1 = int(outer_b.get("size", 10))
    ikind = ikinds[0]
    k2_expr, k2_order = _bucket_key(ikind, inner_spec[ikind], dialect)
    inner_key = f"{inner_name}_key"
    # ES bucket aggs exclude docs missing a key field at EVERY level
    # (also removes the engines' divergent NULL ordering at size cuts)
    guard = f" AND ({f1}) IS NOT NULL AND ({k2_expr}) IS NOT NULL"
    isize = ""
    if ikind == "terms" and "size" in inner_spec[ikind]:
        # joined into the existing WHERE — a second WHERE clause is a
        # parse error (ADVICE r08 finding #1)
        isize = f"  AND r.inner_rank <= {int(inner_spec[ikind]['size'])}\n"
    leaf_cols = "".join(
        ", r." + m.split(" AS ")[-1] for m in leaf_metrics
    )
    return f"""
WITH cells AS (
  SELECT {f1} AS {outer_key}, {k2_expr} AS {inner_key},
         min({k2_order}) AS inner_ord,
         count(*) AS doc_count{mtxt}
  FROM {_ident(index)}
  WHERE ({where}){guard}
  GROUP BY {f1}, {k2_expr}
),
ranked AS (
  SELECT *,
         cast(sum(doc_count) OVER (PARTITION BY {outer_key}) AS BIGINT)
           AS outer_count,
         row_number() OVER (
           PARTITION BY {outer_key}
           ORDER BY doc_count DESC, inner_ord ASC
         ) AS inner_rank
  FROM cells
),
kept AS (
  SELECT {outer_key}, outer_count,
         dense_rank() OVER (ORDER BY outer_count DESC, {outer_key} ASC)
           AS outer_rank
  FROM (SELECT DISTINCT {outer_key}, outer_count FROM ranked)
)
SELECT r.{outer_key}, k.outer_count, r.{inner_key}, r.doc_count{leaf_cols}
FROM ranked r JOIN kept k USING ({outer_key})
WHERE k.outer_rank <= {size1}
{isize}ORDER BY k.outer_count DESC, r.{outer_key} ASC, r.inner_ord ASC,
         r.{inner_key} ASC
"""


def _compile_nested3(
    index: str,
    outer_b: dict,
    mid_pair: tuple,
    leaf_pair: tuple,
    where: str,
    outer_key: str,
    dialect: str,
) -> str:
    """Three bucket levels: terms -> bucket -> bucket, metrics at the
    leaf. Same policy as the two-level shape, applied per level: a
    level's top-N (terms ``size``) is chosen by the bucket's TOTAL
    doc_count within its parent; kept buckets report all their
    children; display order is parent-count-first, then each level's
    own bucket rule (date/histogram keys ascending, range buckets by
    declaration order).

    Scale shape: ONE partial+final aggregation over (k1, k2, k3) —
    every window (per-level totals and ranks) runs on the aggregated
    cells relation (bucket-cardinality rows), never the raw corpus;
    depth adds columns to one shuffle key, not extra shuffles. Depth
    4+ raises (reject, don't guess)."""
    mid_name, mid_spec = mid_pair
    leaf_name, leaf_spec = leaf_pair
    mkinds = [k for k in mid_spec if k != "aggs"]
    lkinds = [k for k in leaf_spec if k != "aggs"]
    if len(mkinds) != 1 or mkinds[0] not in _BUCKETS:
        raise ValueError("es_dsl: nested sub-agg must be a bucket agg")
    if len(lkinds) != 1 or lkinds[0] not in _BUCKETS:
        raise ValueError("es_dsl: nested sub-agg must be a bucket agg")
    if leaf_spec.get("aggs") and any(
        set(sp) & _BUCKETS or "aggs" in sp
        for sp in leaf_spec["aggs"].values()
    ):
        raise ValueError("es_dsl: nesting depth is three bucket levels")
    leaf_metrics = _metric_list(list(leaf_spec.get("aggs", {}).items()), dialect)
    mtxt = "" if not leaf_metrics else ",\n         " + ",\n         ".join(
        leaf_metrics
    )
    leaf_cols = "".join(", " + m.split(" AS ")[-1] for m in leaf_metrics)
    f1 = _ident(outer_b["field"])
    size1 = int(outer_b.get("size", 10))
    mkind, lkind = mkinds[0], lkinds[0]
    e2, o2 = _bucket_key(mkind, mid_spec[mkind], dialect)
    e3, o3 = _bucket_key(lkind, leaf_spec[lkind], dialect)
    k2, k3 = f"{mid_name}_key", f"{leaf_name}_key"
    guards = (
        f" AND ({f1}) IS NOT NULL AND ({e2}) IS NOT NULL"
        f" AND ({e3}) IS NOT NULL"
    )
    s2 = s3 = ""
    if mkind == "terms" and "size" in mid_spec[mkind]:
        s2 = f" AND r2 <= {int(mid_spec[mkind]['size'])}"
    if lkind == "terms" and "size" in leaf_spec[lkind]:
        s3 = f" AND r3 <= {int(leaf_spec[lkind]['size'])}"
    return f"""
WITH cells AS (
  SELECT {f1} AS {outer_key}, {e2} AS {k2}, {e3} AS {k3},
         min({o2}) AS ord2, min({o3}) AS ord3,
         count(*) AS doc_count{mtxt}
  FROM {_ident(index)}
  WHERE ({where}){guards}
  GROUP BY {f1}, {e2}, {e3}
),
win AS (
  SELECT *,
         cast(sum(doc_count) OVER (PARTITION BY {outer_key}) AS BIGINT)
           AS outer_count,
         cast(sum(doc_count) OVER (PARTITION BY {outer_key}, {k2})
           AS BIGINT) AS {mid_name}_count
  FROM cells
),
ranked AS (
  SELECT *,
         dense_rank() OVER (ORDER BY outer_count DESC, {outer_key} ASC)
           AS r1,
         dense_rank() OVER (
           PARTITION BY {outer_key}
           ORDER BY {mid_name}_count DESC, ord2 ASC, {k2} ASC
         ) AS r2,
         row_number() OVER (
           PARTITION BY {outer_key}, {k2}
           ORDER BY doc_count DESC, ord3 ASC, {k3} ASC
         ) AS r3
  FROM win
)
SELECT {outer_key}, outer_count, {k2}, {mid_name}_count, {k3},
       doc_count{leaf_cols}
FROM ranked
WHERE r1 <= {size1}{s2}{s3}
ORDER BY outer_count DESC, {outer_key} ASC, ord2 ASC, {k2} ASC,
         ord3 ASC, {k3} ASC
"""


_COMPOSITE_SOURCES = {"terms", "date_histogram", "histogram"}


def _compile_composite(
    index: str, b: dict, sub: dict, where: str, dialect: str
) -> str:
    """ES `composite` aggregation: the scalable pagination idiom. All
    source-key combinations enumerate in composite sort order; `after`
    resumes strictly after the given key tuple (rendered as an
    order-aware lexicographic predicate, portable to both dialects —
    no row-value comparison needed); docs missing any source key are
    excluded (ES missing_bucket=false default). Metric sub-aggs apply
    per composite bucket.

    Scale shape: ONE partial+final aggregation over the source keys;
    the after-predicate prunes before the sort; top-size is
    TakeOrdered. This is the DSL surface you page a 100 TB bucket
    space with — no deep from/size offset scan."""
    known = {"sources", "size", "after"}
    bad = set(b) - known
    if bad:
        raise ValueError(f"es_dsl: unsupported composite keys {sorted(bad)}")
    sources = b.get("sources")
    if not isinstance(sources, list) or not sources:
        raise ValueError("es_dsl: composite wants a non-empty sources list")
    size = int(b.get("size", 10))
    keys: list[tuple[str, str, str]] = []  # (out name, key expr, asc|desc)
    for s in sources:
        name, spec2 = _one(s, "composite source")
        skind, sbody = _one(spec2, f"composite source {name}")
        if skind not in _COMPOSITE_SOURCES:
            raise ValueError(
                f"es_dsl: unsupported composite source {skind!r}"
            )
        order = sbody.get("order", "asc")
        if order not in ("asc", "desc"):
            raise ValueError(f"es_dsl: bad composite order {order!r}")
        expr, _ = _bucket_key(skind, {k: v for k, v in sbody.items()
                                      if k != "order"}, dialect)
        keys.append((_ident(name), expr, order))
    metric_sql = _metric_list(list(sub.items()), dialect)
    metrics = (
        "" if not metric_sql else ",\n       " + ",\n       ".join(metric_sql)
    )
    sel = ",\n       ".join(f"{e} AS {n}" for n, e, _ in keys)
    group = ", ".join(e for _, e, _ in keys)
    guards = " AND ".join(f"({e}) IS NOT NULL" for _, e, _ in keys)
    order_by = ", ".join(f"{n} {d.upper()}" for n, _, d in keys)
    after_pred = ""
    after = b.get("after")
    if after is not None:
        if set(after) != {n for n, _, _ in keys}:
            raise ValueError(
                "es_dsl: after must name every composite source"
            )
        # The after predicate is a function of the GROUP BY keys alone,
        # so it pushes BELOW the aggregation onto the key expressions:
        # raw rows belonging to already-paged buckets are dropped at
        # the scan, before the shuffle — paging deep into a 100 TB
        # bucket space gets cheaper, not costlier, with every page.
        disj = []
        for i, (n, e, d) in enumerate(keys):
            conj = [
                f"({keys[j][1]}) = {_lit(after[keys[j][0]], dialect)}"
                for j in range(i)
            ]
            conj.append(
                f"({e}) {'>' if d == 'asc' else '<'} "
                f"{_lit(after[n], dialect)}"
            )
            disj.append("(" + " AND ".join(conj) + ")")
        after_pred = "\n    AND (" + "\n         OR ".join(disj) + ")"
    return f"""
SELECT {sel},
       count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {guards}{after_pred}
GROUP BY {group}
ORDER BY {order_by}
LIMIT {size}
"""


def _compile_filters(
    index: str, b: dict, sub: dict, where: str, key: str, dialect: str,
    id_field: str,
) -> str:
    """ES `filters` aggregation: each named filter is an independent
    bucket (a doc can land in several), with metric sub-aggs per
    bucket. Compiled the percolate way: ONE scan stacks per-row
    matched bucket names into an array, a row-local filter+explode
    fans out (doc, bucket) pairs, then a single GROUP BY — never one
    pass per named filter."""
    named = b.get("filters")
    if not isinstance(named, dict) or not named:
        raise ValueError("es_dsl: filters wants a non-empty name->clause map")
    cases = []
    for name in sorted(named):
        if not re.fullmatch(r"[A-Za-z0-9_\-]+", name):
            raise ValueError(f"es_dsl: bad filters bucket name {name!r}")
        expr = _query_expr(named[name], dialect, id_field)
        cases.append(f"CASE WHEN coalesce({expr}, FALSE) THEN '{name}' END")
    arr = ",\n        " .join(cases)
    if dialect == "spark":
        matched = (
            f"explode(filter(array(\n        {arr}\n      ),"
            " x -> x IS NOT NULL))"
        )
    else:
        matched = (
            f"unnest(list_filter([\n        {arr}\n      ],"
            " x -> x IS NOT NULL))"
        )
    metric_sql = _metric_list(list(sub.items()), dialect)
    metrics = (
        "" if not metric_sql else ",\n       " + ",\n       ".join(metric_sql)
    )
    return f"""
SELECT bucket AS {key}, count(*) AS doc_count{metrics}
FROM (
  SELECT {matched} AS bucket, t.*
  FROM {_ident(index)} t
  WHERE {where}
) m
GROUP BY bucket
ORDER BY {key} ASC
"""


def _compile_top_hits(
    index: str, outer_b: dict, th_pair: tuple, where: str, key: str,
    dialect: str, id_field: str,
) -> str:
    """ES `top_hits` under terms: the top buckets by doc_count, each
    reporting its best N hits by the top_hits sort. `_source` is
    required (the hit payload must be explicit for a stable schema).

    Scale shape: hit ranking is a per-bucket window over the filtered
    scan (partitioned by the bucket key — no global sort); bucket
    selection ranks the AGGREGATED per-bucket counts (tiny relation)
    and joins back, so the global window never sees raw rows."""
    th_name, th_spec = th_pair
    th = th_spec["top_hits"]
    if set(th_spec) != {"top_hits"}:
        raise ValueError("es_dsl: top_hits takes no sibling keys")
    known = {"size", "sort", "_source"}
    bad = set(th) - known
    if bad:
        raise ValueError(f"es_dsl: unsupported top_hits keys {sorted(bad)}")
    cols = th.get("_source")
    if not cols:
        raise ValueError("es_dsl: top_hits requires _source")
    f1 = _ident(outer_b["field"])
    size1 = int(outer_b.get("size", 10))
    hsize = int(th.get("size", 3))
    order: list[str] = []
    for s in th.get("sort", []):
        if isinstance(s, str):
            f, d = s, "asc"
        else:
            f, spec = _one(s, "top_hits sort entry")
            d = spec if isinstance(spec, str) else spec.get("order", "asc")
        if d not in ("asc", "desc"):
            raise ValueError(f"es_dsl: bad sort order {d!r}")
        order.append(f"{_ident(f)} {d.upper()}")
    if id_field not in [o.split()[0] for o in order]:
        order.append(f"{id_field} ASC")
    oby = ", ".join(order)
    src = ", ".join(_ident(c) for c in cols)
    hsrc = ", ".join(f"h.{_ident(c)}" for c in cols)
    return f"""
WITH base AS (
  SELECT * FROM {_ident(index)}
  WHERE ({where}) AND {f1} IS NOT NULL
),
counts AS (
  SELECT {f1} AS bucket_key, count(*) AS doc_count
  FROM base GROUP BY {f1}
),
kept AS (
  SELECT bucket_key, doc_count,
         dense_rank() OVER (ORDER BY doc_count DESC, bucket_key ASC)
           AS bucket_rank
  FROM counts
),
hits AS (
  SELECT {src}, {f1} AS hit_bucket,
         row_number() OVER (PARTITION BY {f1} ORDER BY {oby}) AS hit_rank
  FROM base
)
SELECT k.bucket_key AS {key}, k.doc_count, h.hit_rank, {hsrc}
FROM hits h JOIN kept k ON h.hit_bucket = k.bucket_key
WHERE k.bucket_rank <= {size1} AND h.hit_rank <= {hsize}
ORDER BY k.doc_count DESC, k.bucket_key ASC, h.hit_rank ASC
"""


def _compile_significant_terms(
    index: str, b: dict, where: str, key: str, dialect: str
) -> str:
    """ES significant_terms over an analyzed text field: foreground =
    docs matching the query, background = the whole index; per-token
    DOC frequencies (distinct per doc), JLH score
    ``(fg% - bg%) * (fg% / bg%)`` emitted as the raw IEEE double of
    integer-ratio arithmetic (identical integers -> identical doubles
    in both engines; no rounding to flip).

    Scale shape: two aggregations over the distinct-token stream (one
    filtered), both partial-aggregatable; the join is per-term
    (vocabulary-sized), totals broadcast."""
    f = _ident(b["field"])
    size = int(b.get("size", 10))
    min_dc = int(b.get("min_doc_count", 3))
    te = _tokens_expr(f, dialect)
    if dialect == "spark":
        distinct_w = f"explode(array_distinct({te})) AS w"
    else:
        distinct_w = f"unnest(list_distinct({te})) AS w"
    return f"""
WITH fg_stream AS (
  SELECT {distinct_w} FROM {_ident(index)} WHERE {where}
),
bg_stream AS (
  SELECT {distinct_w} FROM {_ident(index)}
),
fg_df AS (SELECT w, count(*) AS fg FROM fg_stream GROUP BY w),
bg_df AS (SELECT w, count(*) AS bg FROM bg_stream GROUP BY w),
fg_tot AS (SELECT count(*) AS n_fg FROM {_ident(index)} WHERE {where}),
bg_tot AS (SELECT count(*) AS n_bg FROM {_ident(index)})
SELECT w AS {key}, fg AS doc_count, bg AS bg_count,
       ((cast(fg AS DOUBLE) / n_fg) - (cast(bg AS DOUBLE) / n_bg))
         * ((cast(fg AS DOUBLE) / n_fg) / (cast(bg AS DOUBLE) / n_bg))
         AS score
FROM fg_df JOIN bg_df USING (w) CROSS JOIN fg_tot CROSS JOIN bg_tot
WHERE fg >= {min_dc}
  AND (cast(fg AS DOUBLE) / n_fg) > (cast(bg AS DOUBLE) / n_bg)
ORDER BY score DESC, {key} ASC
LIMIT {size}
"""


def _compile_cumulative_cardinality(
    index: str, b: dict, kind: str, cc: tuple[str, dict],
    metric_sql: list[str], sub: dict, where: str, key: str, dialect: str,
) -> str:
    """ES `cumulative_cardinality`: how many DISTINCT values have been
    seen up to each bucket — "total unique users to date". EXACT here
    (ES chains HLL sketches): each value contributes at its FIRST
    bucket (one value-keyed aggregation), first-occurrence counts sum
    cumulatively over the bucket axis. Scale shape: the firsts relation
    is distinct-value-sized and collapses to bucket-cardinality before
    the join; the window runs on bucket rows. buckets_path must name a
    sibling `cardinality` agg — that is where the field comes from,
    exactly as in ES."""
    name, spec = cc
    p = spec["cumulative_cardinality"]
    if set(spec) != {"cumulative_cardinality"}:
        raise ValueError(
            "es_dsl: cumulative_cardinality takes no sibling keys"
        )
    bad = set(p) - {"buckets_path"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported cumulative_cardinality keys "
            f"{sorted(bad)}"
        )
    path = p.get("buckets_path")
    card = sub.get(path, {})
    if not isinstance(card, dict) or "cardinality" not in card:
        raise ValueError(
            f"es_dsl: cumulative_cardinality buckets_path {path!r} "
            "must name a sibling cardinality agg"
        )
    f = _ident(card["cardinality"]["field"])
    key_expr, _ = _bucket_key(kind, b, dialect)
    mdc = int(b.get("min_doc_count", 1))
    if mdc != 1:
        raise ValueError(
            "es_dsl: cumulative_cardinality with min_doc_count != 1 "
            "is unsupported (a filtered axis would skip first-"
            "occurrence buckets)"
        )
    metrics = (
        "" if not metric_sql else ",\n       " + ",\n       ".join(metric_sql)
    )
    n = _ident(name)
    return f"""
WITH base AS (
  SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL
  GROUP BY {key_expr}
),
firsts AS (
  SELECT min({key_expr}) AS k
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL AND {f} IS NOT NULL
  GROUP BY {f}
),
inc AS (
  SELECT k, count(*) AS new_vals FROM firsts GROUP BY k
)
SELECT b.*,
       cast(sum(coalesce(i.new_vals, 0)) OVER (
         ORDER BY b.{key} ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS {n}
FROM base b LEFT JOIN inc i ON i.k = b.{key}
ORDER BY b.{key} ASC
"""


def _compile_adjacency_matrix(
    index: str, b: dict, where: str, key: str, dialect: str,
    id_field: str,
) -> str:
    """ES adjacency_matrix: N named filters -> one bucket per filter
    plus one per pairwise intersection (key "a&b", names sorted), only
    non-empty buckets returned, ordered by key. Compiled as ONE scan:
    every bucket is a conditional count in a single aggregate row, then
    K row-local SELECTs over that 1-row relation unpivot it — bucket
    count is K = N + N(N-1)/2, never data-sized, and the fact table is
    read once regardless of N."""
    bad = set(b) - {"filters", "separator"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported adjacency_matrix keys {sorted(bad)}"
        )
    filters = b.get("filters")
    if not isinstance(filters, dict) or len(filters) < 2:
        raise ValueError(
            "es_dsl: adjacency_matrix wants >= 2 named filters"
        )
    sep = b.get("separator", "&")
    if not isinstance(sep, str) or "'" in sep or "\\" in sep:
        raise ValueError(f"es_dsl: bad adjacency_matrix separator {sep!r}")
    names = sorted(filters)
    conds = {
        n: f"coalesce({_query_expr(filters[n], dialect, id_field)}, FALSE)"
        for n in names
    }
    sums, rows = [], []
    for i, a in enumerate(names):
        label = a.replace("'", "''")
        sums.append(f"sum(CASE WHEN {conds[a]} THEN 1 ELSE 0 END) AS c{i}")
        # cast: DuckDB widens sum(CASE) to HUGEINT; the driver hash
        # needs BIGINT in both engines
        rows.append(
            f"SELECT '{label}' AS {key}, cast(c{i} AS BIGINT)"
            " AS doc_count FROM agg"
        )
        for j in range(i + 1, len(names)):
            pair = f"{a}{sep}{names[j]}".replace("'", "''")
            sums.append(
                f"sum(CASE WHEN {conds[a]} AND {conds[names[j]]} "
                f"THEN 1 ELSE 0 END) AS c{i}_{j}"
            )
            rows.append(
                f"SELECT '{pair}' AS {key}, cast(c{i}_{j} AS BIGINT)"
                " AS doc_count FROM agg"
            )
    sums_sql = ",\n         ".join(sums)
    union = "\n  UNION ALL ".join(rows)
    return f"""
WITH agg AS (
  SELECT {sums_sql}
  FROM {_ident(index)}
  WHERE {where}
)
SELECT {key}, doc_count FROM (
  {union}
) buckets
WHERE doc_count > 0
ORDER BY {key} ASC
"""
