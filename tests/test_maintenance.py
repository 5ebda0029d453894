"""Small-file compaction: plan correctness, content preservation,
output uniformity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from golang_db_query_engine_elasticsearch_indexer_spark import maintenance


def _row_checksum(df):
    """Order-independent content checksum: sum of per-row xxhash64 over
    all columns (null-total via sum of bigints)."""
    return df.select(
        F.sum(
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
        ).alias("s")
    ).collect()[0].s


def test_compaction_plan_and_rewrite(spark, tables, tmp_path):
    src = os.path.join(str(tmp_path), "fragmented")
    dst = os.path.join(str(tmp_path), "compacted")
    docs = spark.table("documents")
    docs.repartition(64).write.parquet(src)

    plan = maintenance.plan_compaction(spark, src, target_mb=1024)
    assert plan.n_files == 64
    assert plan.total_bytes > 0
    assert plan.target_files == 1  # tiny fixture fits one 1 GiB target
    assert plan.needed

    before = _row_checksum(spark.read.parquet(src))
    n_before = spark.read.parquet(src).count()

    report = maintenance.compact_parquet(spark, src, dst, target_mb=1024)
    assert report.written_files == plan.target_files
    assert report.rows == n_before
    assert _row_checksum(spark.read.parquet(dst)) == before


def test_compaction_targets_multiple_uniform_files(spark, tables, tmp_path):
    """A sub-MB target forces a multi-file rewrite; round-robin
    repartition must yield near-uniform file sizes (the reason it is
    chosen over coalesce)."""
    src = os.path.join(str(tmp_path), "frag2")
    dst = os.path.join(str(tmp_path), "comp2")
    spark.table("documents").repartition(32).write.parquet(src)

    target = 0.02  # 20 KB target forces a multi-file plan at any scale
    plan = maintenance.plan_compaction(spark, src, target_mb=target)
    assert plan.target_files >= 2
    report = maintenance.compact_parquet(spark, src, dst, target_mb=target)
    assert report.written_files == plan.target_files
    sizes = [s for _, s in maintenance._list_parquet_files(spark, dst)]
    assert max(sizes) < 3 * min(sizes), f"skewed output files: {sizes}"


def test_compaction_refuses_to_flatten_partitioned_source(spark, tables, tmp_path):
    """A hive-partitioned source without partition_by must raise (a
    plain rewrite would silently flatten the layout and break partition
    pruning); with partition_by the layout survives and each partition
    coalesces to one file."""
    import pytest

    src = os.path.join(str(tmp_path), "part_src")
    dst = os.path.join(str(tmp_path), "part_dst")
    (
        spark.table("orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .repartition(8)
        .write.partitionBy("o_year")
        .parquet(src)
    )
    with pytest.raises(ValueError, match="hive-partitioned"):
        maintenance.compact_parquet(spark, src, dst)

    report = maintenance.compact_parquet(
        spark, src, dst, partition_by=["o_year"]
    )
    assert report.rows == spark.table("orders").count()
    out = spark.read.parquet(dst)
    assert "o_year" in out.columns
    years = [r.o_year for r in out.select("o_year").distinct().collect()]
    per_dir = maintenance._list_parquet_files(spark, dst)
    assert len(per_dir) == len(years)  # one file per partition value
    assert all(f"o_year=" in p for p, _ in per_dir)


def test_compaction_plan_not_needed_when_already_compact(spark, tables, tmp_path):
    src = os.path.join(str(tmp_path), "ok")
    spark.table("region").coalesce(1).write.parquet(src)
    plan = maintenance.plan_compaction(spark, src, target_mb=128)
    assert plan.n_files == 1
    assert not plan.needed


def test_partition_detection_ignores_ancestor_dirs_with_equals(
    spark, tables, tmp_path
):
    """An ancestor directory containing '=' (e.g. a run-scoped
    'job=nightly' workspace) must NOT trigger the hive-partitioned
    refusal: only segments BELOW the qualified table root are
    partition candidates (ADVICE r05: the bare-path prefix split
    missed against scheme-qualified listings and scanned the whole
    absolute path)."""
    root = os.path.join(str(tmp_path), "job=nightly", "flat_src")
    dst = os.path.join(str(tmp_path), "flat_dst")
    spark.table("region").coalesce(1).write.parquet(root)
    report = maintenance.compact_parquet(spark, root, dst, target_mb=1024)
    assert report.rows == spark.table("region").count()
    assert report.partitioned_target_files is None


def test_partitioned_compaction_splits_oversized_partitions(
    spark, tables, tmp_path
):
    """With partition_by, target_mb is honored per partition-value
    directory: a directory larger than the target splits into
    ~ceil(bytes/target) files instead of one oversized file (ADVICE
    r05), while content and layout are preserved."""
    src = os.path.join(str(tmp_path), "big_part_src")
    dst = os.path.join(str(tmp_path), "big_part_dst")
    (
        spark.table("orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .repartition(4)
        .write.partitionBy("o_year")
        .parquet(src)
    )
    files = maintenance._list_parquet_files(spark, src)
    qroot = maintenance._qualified_root(spark, src)
    # pick a target that forces every year to need >= 2 files
    per_dir: dict[str, int] = {}
    for p, s in files:
        d = p.rsplit("/", 1)[0]
        per_dir[d] = per_dir.get(d, 0) + s
    target_mb = (min(per_dir.values()) / 2) / (1024 * 1024)
    report = maintenance.compact_parquet(
        spark, src, dst, target_mb=target_mb, partition_by=["o_year"]
    )
    targets = maintenance._partition_file_targets(
        files, max(1, int(target_mb * 1024 * 1024))
    )
    assert report.partitioned_target_files == sum(targets.values())
    assert min(targets.values()) >= 2
    # every partition directory got more than one output file
    out_per_dir: dict[str, int] = {}
    for p, _ in maintenance._list_parquet_files(spark, dst):
        d = p.rsplit("/", 1)[0]
        out_per_dir[d] = out_per_dir.get(d, 0) + 1
    assert len(out_per_dir) == len(per_dir)
    assert min(out_per_dir.values()) >= 2
    # content preserved (order-independent checksum), layout preserved
    a = _row_checksum(spark.read.parquet(src))
    b = _row_checksum(spark.read.parquet(dst))
    assert a == b
    assert maintenance._partition_dirs(
        maintenance._list_parquet_files(spark, dst),
        maintenance._qualified_root(spark, dst),
    ) == {"o_year"}
    assert qroot.endswith("big_part_src")


def test_partitioned_compaction_two_level_layout(spark, tables, tmp_path):
    """Two partition columns: detection finds both, the rewrite
    preserves the nested layout, and per-LEAF-directory sizing still
    holds (each leaf dir fits the big target -> exactly one file)."""
    src = os.path.join(str(tmp_path), "two_src")
    dst = os.path.join(str(tmp_path), "two_dst")
    (
        spark.table("orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("o_half", (F.month("o_orderdate") <= 6).cast("int"))
        .repartition(4)
        .write.partitionBy("o_year", "o_half")
        .parquet(src)
    )
    files = maintenance._list_parquet_files(spark, src)
    qroot = maintenance._qualified_root(spark, src)
    assert maintenance._partition_dirs(files, qroot) == {"o_year", "o_half"}
    report = maintenance.compact_parquet(
        spark, src, dst, target_mb=1024, partition_by=["o_year", "o_half"]
    )
    assert report.rows == spark.table("orders").count()
    out_files = maintenance._list_parquet_files(spark, dst)
    leaf_dirs = {p.rsplit("/", 1)[0] for p, _ in out_files}
    src_leaf_dirs = {p.rsplit("/", 1)[0] for p, _ in files}
    assert len(out_files) == len(leaf_dirs) == len(src_leaf_dirs)
    assert all("o_year=" in d and "o_half=" in d for d in leaf_dirs)
    assert report.partitioned_target_files == len(src_leaf_dirs)
    a = _row_checksum(spark.read.parquet(src))
    b = _row_checksum(spark.read.parquet(dst))
    assert a == b
