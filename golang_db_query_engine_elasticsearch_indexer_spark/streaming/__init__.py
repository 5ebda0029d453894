"""Structured Streaming extensions over the ``events`` table.

The reference is strictly batch (SURVEY.md §1.4); these are the
extension rows of §2.B "Streaming": tumbling-window aggregation,
gap-based session windows, and streaming dedup, written as
``readStream`` pipelines. For the driver contract each pipeline runs
against the fixture parquet as a bounded stream (file source +
``processAllAvailable`` + memory sink) and returns the materialized
result — REAL streaming execution, verified against batch SQL oracles.

Scale posture: on a cluster the same code points at a Kafka/file-drop
source; watermarks bound state, window aggs shuffle once per trigger on
(window, key).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file stream of the events fixture.

    The stream schema is DERIVED from the parquet footer (a batch
    metadata-only read), never assumed: current fixtures store ``ts``
    as TIMESTAMP(MICROS) which surfaces directly as timestamp_ntz;
    older generations stored TIMESTAMP(NANOS), which (under
    ``nanosAsLong``) surfaces as LongType nanoseconds and gets the same
    ns->ntz conversion the batch registry applies
    (session.register_sf_dir). This keeps stream and batch readers
    agreeing with each other — and with the DuckDB oracle — whichever
    way the fixtures were written.
    """
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema  # footer-only, no data scan
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # Watermarks demand TIMESTAMP (ltz); the UTC session makes the
        # ntz->ltz cast identity on rendered values, so window starts
        # still string-match the DuckDB oracle's naive timestamps.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return raw


def _run_to_table(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a bounded stream to completion into a memory sink."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows x event_type: count + sum(value)."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_to_table(agg, "complete")
    return out.select(
        F.col("w.start").cast("string").alias("hour_start"),
        "event_type",
        "n",
        "total_value",
    ).orderBy("hour_start", "event_type")


TUMBLING_ORACLE = """
SELECT cast(date_trunc('hour', ts) AS string) AS hour_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY hour_start, event_type
"""


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, 30 min slide) x event_type.

    Each event lands in two overlapping windows; the batch oracle
    reproduces that by fanning each event out to its k=0,1 grid starts.
    """
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    out = _run_to_table(agg, "complete")
    return out.select(
        F.col("w.start").cast("string").alias("win_start"),
        "event_type",
        "n",
    ).orderBy("win_start", "event_type")


SLIDING_ORACLE = """
WITH fanned AS (
  SELECT event_type,
         time_bucket(INTERVAL 30 minutes, ts) - k * INTERVAL 30 minutes AS win_start,
         ts
  FROM events, (SELECT unnest(range(0, 2)) AS k)
)
SELECT cast(win_start AS string) AS win_start, event_type, count(*) AS n
FROM fanned
WHERE ts < win_start + INTERVAL 1 hour
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""


def session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) per user via
    ``F.session_window``; post-aggregated (batch) to sessions-per-user.

    The oracle is the independent batch formulation: lag() gap >30min
    marks a new session — two different algorithms, same answer.
    """
    sessions = (
        _events_stream(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_table(sessions, "complete")
    return (
        out.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("user_id")
    )


SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800000000 THEN 1
              ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       cast(sum(new_session) AS bigint) AS n_sessions,
       count(*) AS n_events
FROM gaps
GROUP BY user_id
ORDER BY user_id
"""


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on event_id (watermarked) -> per-type counts."""
    deduped = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    out = _run_to_table(deduped, "complete")
    return out.orderBy("event_type")


STREAM_DEDUP_ORACLE = """
SELECT event_type, count(DISTINCT event_id) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state: ``dropDuplicatesWithinWatermark``
    keys state by event_id but evicts entries once the watermark passes
    them — the form that holds at unbounded stream length (plain
    dropDuplicates state grows forever). On the bounded fixture (no
    duplicate event_ids across the watermark) it is batch-equivalent.
    """
    deduped = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    out = _run_to_table(deduped, "complete")
    return out.orderBy("event_type")


def _user_summary_fn(key, pdf_iter, state):
    """Custom stateful kernel: accumulate (n_events, total_value) per
    user across micro-batches in GroupState, emit the running summary.

    Arrow-batched (pandas per group-chunk) — the supported shape for
    stateful logic Spark's built-in operators can't express.
    """
    import pandas as pd  # noqa: PLC0415 — runs on executors

    (user_id,) = key
    if state.exists:
        n, tot = state.get
    else:
        n, tot = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        tot += float(pdf["value"].sum())
    state.update((int(n), float(tot)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [tot]}
    )


def stateful_user_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (event count, value total), state kept in the
    store between micro-batches.

    In update mode each batch emits the refreshed summary; n_events is
    strictly increasing per user, so the post-aggregation keeps the
    latest emission per user regardless of how the bounded stream was
    split into batches — making the result batch-equivalent and
    oracle-checkable.
    """
    stream = _events_stream(spark, sf_dir)
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _user_summary_fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, tot double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    out = _run_to_table(updated, "update")
    return (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.round(F.col("s.total_value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


STATEFUL_SUMMARY_ORACLE = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-bounded join — Structured Streaming's hardest
    shape: for each ``view`` event, the ``click`` events by the same
    user within the following 30 minutes. Both sides are watermarked
    (1 hour) and the join carries the event-time range condition, which
    is what lets Spark bound both join-state buffers — without the time
    bound, stream-stream join state grows forever.

    The joined rows are post-aggregated (batch) to per-user pair
    counts so the bounded-stream result is compact and order-free; the
    oracle is the equivalent batch self-join.
    """
    ev = _events_stream(spark, sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND c_ts > v_ts AND c_ts <= v_ts + interval 30 minutes"
        ),
    )
    out = _run_to_table(joined.select("v_user", "view_id", "click_id"), "append")
    return (
        out.groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("view_id").alias("n_views_with_click"),
        )
        .orderBy("user_id")
    )


VIEW_CLICK_JOIN_ORACLE = """
WITH pairs AS (
  SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
  FROM events v
  JOIN events c
    ON c.user_id = v.user_id
   AND v.event_type = 'view' AND c.event_type = 'click'
   AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 minutes
)
SELECT user_id, count(*) AS n_pairs,
       count(DISTINCT view_id) AS n_views_with_click
FROM pairs
GROUP BY user_id
ORDER BY user_id
"""


def static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the remaining streaming join
    shape (stream-stream is ``view_click_join``): the events stream
    joined to the static ``customer`` dimension, then aggregated per
    nation. Stream-static inner joins are STATELESS (each micro-batch
    probes the static side; no watermark, no join-state buffer), which
    is why the static side is explicitly broadcast — at cluster scale
    the dimension ships once per executor and the stream never
    shuffles for the join.

    ID-SPACE STAND-IN: ``events.user_id`` plays the customer key
    (fixture tables are independent; user_id 0..149 inner-joins
    c_custkey 1..N so the enrichment is non-vacuous). With a real
    keyed dimension the same plan applies unchanged.
    """
    ev = _events_stream(spark, sf_dir)
    cust = spark.table("customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    agg = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_to_table(agg, "complete")
    return out.orderBy("c_nationkey")


STATIC_ENRICH_ORACLE = """
SELECT c_nationkey, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def stream_index_events(
    spark: SparkSession,
    sf_dir: str,
    sink,
    index_name: str = "events_stream",
) -> dict:
    """Continuous indexing: events stream -> ``foreachBatch`` -> bulk
    sink — the reference's save pipeline (elastic_controller.go:253-301)
    lifted onto Structured Streaming, which the batch-only reference
    cannot do at all.

    Each micro-batch bulk-writes through the SAME pluggable sink the
    batch path uses (JsonlIndexSink / HttpBulkSink — whose
    flush-interval now matters, see HttpBulkSink docstring). Doc
    identity is the natural key ``event_id``: positional IDs are
    undefined under unbounded input, so the stream path upserts by key
    — re-delivered events overwrite themselves, making the sink
    idempotent under at-least-once delivery (the property that makes
    this safe on a real cluster).

    Returns accumulated run stats: {docs, failed, batches}.
    """
    from golang_db_query_engine_elasticsearch_indexer_spark.indexer import ID_COL

    totals = {"docs": 0, "failed": 0, "batches": 0}

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        with_id = batch_df.withColumn(ID_COL, F.col("event_id").cast("string"))
        stats = sink.write(batch_df.sparkSession, with_id, index_name)
        totals["docs"] += stats.num_docs
        totals["failed"] += stats.num_failed
        totals["batches"] += 1

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.outputMode("append")
        .foreachBatch(_write_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return totals


def registry() -> dict[str, dict]:
    return {
        "stream_tumbling_counts": {"fn": tumbling_counts, "oracle": TUMBLING_ORACLE},
        "stream_sliding_counts": {"fn": sliding_counts, "oracle": SLIDING_ORACLE},
        "stream_session_counts": {"fn": session_counts, "oracle": SESSION_ORACLE},
        "stream_dedup_counts": {"fn": stream_dedup, "oracle": STREAM_DEDUP_ORACLE},
        "stream_dedup_within_watermark": {
            "fn": stream_dedup_within_watermark,
            "oracle": STREAM_DEDUP_ORACLE,
        },
        "stream_stateful_user_summary": {
            "fn": stateful_user_summary,
            "oracle": STATEFUL_SUMMARY_ORACLE,
        },
        "stream_view_click_join": {
            "fn": view_click_join,
            "oracle": VIEW_CLICK_JOIN_ORACLE,
        },
        "stream_static_enrich": {
            "fn": static_enrich,
            "oracle": STATIC_ENRICH_ORACLE,
        },
    }
