"""Table maintenance: small-file compaction.

The reference delegates storage layout to MySQL and Elasticsearch; an
engine that owns its parquet tables also owns the small-file problem —
at 100 TB a table ingested by many tasks (or a streaming sink's
per-trigger output) fragments into millions of KB-scale files, and the
scan bill becomes dominated by file-open/footer-read overhead and
scheduler pressure rather than bytes (every file is at least one task;
zone-map pruning works per row group, which tiny files never fill).
Compaction is the standing maintenance job that rewrites a table into
~target-sized files.

Shape: one read -> one round-robin repartition to the planned file
count -> one write. The plan is computed from the FILE LISTING (sizes
from the filesystem, through the same Hadoop FS abstraction Spark
scans with, so it works for file://, hdfs://, s3a:// alike) — never
from a data scan. ``repartition(n)`` (round-robin) is chosen over
``coalesce(n)`` deliberately: coalesce avoids the shuffle but merges
whole input files, so a skewed input (one big file + many tiny ones)
yields skewed output; the one shuffle buys uniformly-sized output
files, which is the point of the exercise. For sort-preserving layouts
compose with the z-order writer (`operators/layout.py`) instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_MB = 128


@dataclass(frozen=True)
class CompactionPlan:
    n_files: int
    total_bytes: int
    target_bytes: int
    target_files: int

    @property
    def needed(self) -> bool:
        """Compaction pays off when the table has materially more files
        than the byte-optimal count."""
        return self.n_files > max(self.target_files, 1)


@dataclass(frozen=True)
class CompactionReport:
    plan: CompactionPlan
    written_files: int
    rows: int


def _list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, size) of every parquet data file under ``path``, via the
    Hadoop FS API (scheme-agnostic: local, HDFS, object stores)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            out.append((st.getPath().toString(), int(st.getLen())))
    return out


def plan_compaction(
    spark: SparkSession, path: str, target_mb: float = DEFAULT_TARGET_MB
) -> CompactionPlan:
    """Size the rewrite from the file listing alone (no data scan)."""
    files = _list_parquet_files(spark, path)
    total = sum(sz for _, sz in files)
    target_bytes = max(1, int(target_mb * 1024 * 1024))
    target_files = max(1, -(-total // target_bytes))  # ceil div
    return CompactionPlan(
        n_files=len(files),
        total_bytes=total,
        target_bytes=target_bytes,
        target_files=target_files,
    )


def _partition_dirs(files: list[tuple[str, int]], root: str) -> set[str]:
    """Hive-style partition column names (``col=value`` path segments)
    appearing between ``root`` and the data files."""
    cols: set[str] = set()
    root = root.rstrip("/")
    for path, _ in files:
        rel = path.split(root + "/", 1)[-1]
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                cols.add(seg.split("=", 1)[0])
    return cols


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: float = DEFAULT_TARGET_MB,
    partition_by: list[str] | None = None,
) -> CompactionReport:
    """Rewrite ``src_path`` into ~target-sized files at ``dst_path``.

    Writes to a NEW path rather than in place: parquet directories have
    no atomic swap, so the safe production sequence is write-new ->
    validate -> repoint (or rename) — the same publish discipline as
    the bulk sink's atomic alias rollover (`indexer.py`). Content
    equality is the caller's validation hook; the report carries the
    row count for it.

    Hive-partitioned sources must pass ``partition_by``: a plain
    rewrite would silently flatten the directory layout and destroy the
    partition pruning the layout exists for, so that case RAISES
    instead. With ``partition_by`` the rewrite preserves the layout and
    coalesces each partition's fragments to one file per partition
    value (the hash repartition on the partition keys routes every
    value to a single task)."""
    files = _list_parquet_files(spark, src_path)
    part_cols = _partition_dirs(files, src_path)
    if part_cols and not partition_by:
        raise ValueError(
            f"source is hive-partitioned on {sorted(part_cols)}; pass "
            "partition_by to preserve the layout (a plain rewrite would "
            "flatten it and break partition pruning)"
        )
    plan = plan_compaction(spark, src_path, target_mb)
    df = spark.read.parquet(src_path)
    if partition_by:
        (
            df.repartition(*partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(dst_path)
        )
    else:
        (
            df.repartition(plan.target_files)
            .write.mode("overwrite")
            .parquet(dst_path)
        )
    written = _list_parquet_files(spark, dst_path)
    rows = spark.read.parquet(dst_path).count()
    return CompactionReport(plan=plan, written_files=len(written), rows=rows)
