"""Streaming semantics: bounded-stream parity is covered by the oracle
suite; here we exercise watermark late-data handling with a real
two-batch file drop (append mode), which the bounded runs can't show.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    import datetime as dt

    rows = [
        (i, dt.datetime.fromisoformat(ts), v)
        for i, ts, v in rows
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ltz, v double")
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    name = f"late_{uuid.uuid4().hex[:6]}"

    # batch 1: events up to 12:00 -> watermark advances to 11:50
    _write_batch(
        spark,
        src,
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (2, "2024-01-01 10:20:00", 1.0),
            (3, "2024-01-01 12:00:00", 1.0),
        ],
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp_ltz, v double")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # batch 2: one on-time-ish row + one very late row (09:00, far
        # behind the 11:50 watermark -> must be dropped)
        _write_batch(
            spark,
            src,
            [
                (4, "2024-01-01 12:10:00", 1.0),
                (5, "2024-01-01 09:00:00", 99.0),
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (str(r["w"]["start"]), r["n"]) for r in spark.table(name).collect()
    }
    # 10:00-10:30 window emitted with ONLY the two on-time rows; the
    # late 09:00 row created no 09:00 window.
    assert any("10:00:00" in s and n == 2 for s, n in rows)
    assert not any("09:00:00" in s for s, n in rows)


def test_stateful_summary_state_survives_micro_batches(spark, tmp_path):
    """applyInPandasWithState must carry GroupState across micro-batches:
    two files, maxFilesPerTrigger=1 -> two batches; the second emission
    per user must include the first batch's counts."""
    from golang_db_query_engine_elasticsearch_indexer_spark.streaming import (
        _user_summary_fn,
    )

    src = str(tmp_path / "state_src")
    os.makedirs(src, exist_ok=True)
    _write_batch(spark, src, [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 10:05:00", 2.0)])
    _write_batch(spark, src, [(3, "2024-01-01 10:10:00", 3.0)])

    name = f"state_{uuid.uuid4().hex[:6]}"
    stream = (
        spark.readStream.schema("event_id long, ts timestamp_ltz, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("user_id", F.lit(7))
        .withColumnRenamed("v", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_summary_fn,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, tot double",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
    q = stream.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emissions = sorted(
        (r.n_events, r.total_value) for r in spark.table(name).collect()
    )
    # one emission per micro-batch; the later one accumulates state
    assert emissions[-1] == (3, 6.0)
    assert len(emissions) == 2 and emissions[0] in {(1, 3.0), (2, 3.0)}
