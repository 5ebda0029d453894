"""Streaming checkpoint recovery: the exactly-once contract across a
restart.

The production failure mode this pins: a streaming job dies mid-corpus
and is restarted. Correct behavior requires three pieces of state to
survive in the checkpoint — source offsets (already-read files are not
re-read), operator state (the dedup state store resumes, so keys seen
before the crash are still deduplicated after it), and sink commit log
(no partial-batch double-writes). The test drives two availableNow
incarnations of the same query over a growing file source, with the
second input overlapping the first's keys, and asserts the output is
exactly the distinct key set — each key once, across the restart
boundary."""

from __future__ import annotations

import os


def _start(spark, src, out, ckpt, schema):
    return (
        spark.readStream.schema(schema)
        .parquet(src)
        .dropDuplicates(["event_id"])
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def test_exactly_once_across_restart(spark, tables, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(src)

    ev = spark.table("events").select("event_id", "event_type", "user_id")
    schema = ev.schema

    # incarnation 1: first half of the corpus
    first = ev.where("event_id % 2 = 0")
    first.write.mode("append").parquet(src)
    q1 = _start(spark, src, out, ckpt, schema)
    q1.awaitTermination()

    # crash boundary; incarnation 2's input OVERLAPS incarnation 1's
    # keys (one-third of the old half re-arrives) plus the new half
    overlap = ev.where("event_id % 6 = 0")
    second = ev.where("event_id % 2 = 1").unionByName(overlap)
    second.write.mode("append").parquet(src)
    q2 = _start(spark, src, out, ckpt, schema)
    q2.awaitTermination()

    got = spark.read.json(out)
    n_total = ev.count()
    assert got.count() == n_total, "each key exactly once across restart"
    assert got.select("event_id").distinct().count() == n_total
    # and the restarted incarnation actually produced the new keys
    odd = got.where("event_id % 2 = 1").count()
    assert odd == ev.where("event_id % 2 = 1").count()


def test_restart_without_new_input_emits_nothing(spark, tables, tmp_path):
    """A third incarnation over an unchanged source directory must be a
    no-op: offsets in the checkpoint already cover every file."""
    src = os.path.join(str(tmp_path), "in")
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(src)
    ev = spark.table("events").select("event_id", "event_type")
    ev.limit(50).write.mode("append").parquet(src)
    schema = ev.schema

    q1 = _start(spark, src, out, ckpt, schema)
    q1.awaitTermination()
    n1 = spark.read.json(out).count()

    q2 = _start(spark, src, out, ckpt, schema)
    q2.awaitTermination()
    n2 = spark.read.json(out).count()
    assert n1 == n2
