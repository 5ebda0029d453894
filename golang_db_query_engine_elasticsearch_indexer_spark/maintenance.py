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
    # Partitioned rewrites size each partition-value directory
    # separately (sum of per-directory ceil(bytes/target)); the global
    # ``plan.target_files`` does not describe that write, so the
    # partitioned path reports its own target here (None for plain
    # rewrites).
    partitioned_target_files: int | None = None


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


def _qualified_root(spark: SparkSession, path: str) -> str:
    """``path`` as the filesystem's fully-qualified URI (the same form
    the Hadoop listing returns), so relative paths are derived by
    prefix against LIKE strings — a bare ``/tmp/t`` caller path never
    string-matches the listing's ``file:/tmp/t/...`` otherwise, and an
    ancestor directory containing ``=`` would then be misread as a
    partition segment."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.makeQualified(p).toString().rstrip("/")


def _rel_path(path: str, qroot: str) -> str | None:
    """Path relative to the qualified table root; None if outside it."""
    prefix = qroot + "/"
    return path[len(prefix):] if path.startswith(prefix) else None


def _partition_dirs(files: list[tuple[str, int]], qroot: str) -> set[str]:
    """Hive-style partition column names (``col=value`` path segments)
    appearing between the QUALIFIED ``qroot`` and the data files; only
    segments strictly below the table root are inspected."""
    cols: set[str] = set()
    qroot = qroot.rstrip("/")
    for path, _ in files:
        rel = _rel_path(path, qroot)
        if rel is None:
            continue
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                cols.add(seg.split("=", 1)[0])
    return cols


def _partition_file_targets(
    files: list[tuple[str, int]], target_bytes: int
) -> dict[str, int]:
    """Per-directory output-file counts: directory (dirname of each
    listed data file, scheme-qualified) -> ceil(dir bytes / target)."""
    sizes: dict[str, int] = {}
    for path, sz in files:
        d = path.rsplit("/", 1)[0]
        sizes[d] = sizes.get(d, 0) + sz
    return {d: max(1, -(-b // target_bytes)) for d, b in sizes.items()}


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
    sizes each partition-value directory INDEPENDENTLY against
    ``target_mb``: a partition that fits the target coalesces to one
    file, an oversized one splits across ceil(bytes/target) files via a
    salt column (rows are routed to their directory's salt range by
    their source file, read off ``input_file_name()`` — no value
    parsing, no join). The report's ``partitioned_target_files`` —
    not the global ``plan.target_files`` — describes that write."""
    files = _list_parquet_files(spark, src_path)
    qroot = _qualified_root(spark, src_path)
    part_cols = _partition_dirs(files, qroot)
    if part_cols and not partition_by:
        raise ValueError(
            f"source is hive-partitioned on {sorted(part_cols)}; pass "
            "partition_by to preserve the layout (a plain rewrite would "
            "flatten it and break partition pruning)"
        )
    plan = plan_compaction(spark, src_path, target_mb)
    df = spark.read.parquet(src_path)
    part_target: int | None = None
    if partition_by:
        from pyspark.sql import functions as F  # noqa: PLC0415

        targets = _partition_file_targets(files, plan.target_bytes)
        part_target = sum(targets.values())
        # Global contiguous bucket per output file: each partition-value
        # directory owns the bucket range [offset, offset + n_files) and
        # its rows are salted across that range. Rows find their
        # directory via input_file_name() (no partition-value parsing,
        # no join); the dir -> (offset, n_files) map is a broadcast
        # literal bounded by partition cardinality, never file count.
        # repartitionByRange with an EXPLICIT count keys one bucket per
        # task — a plain repartition(cols) here gets its small shuffle
        # partitions re-coalesced by AQE into one task per value,
        # silently undoing the split (measured: every salt collapsed
        # back to one file). Scheme-qualified URIs are normalized on
        # both sides because input_file_name() and the Hadoop listing
        # render the authority differently (file:///x vs file:/x).
        import re  # noqa: PLC0415

        def _norm(p: str) -> str:
            return re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*:/+", "/", p)

        off_entries: list = []
        nf_entries: list = []
        offset = 0
        for d, n in sorted(targets.items()):
            off_entries.extend((F.lit(_norm(d)), F.lit(offset)))
            nf_entries.extend((F.lit(_norm(d)), F.lit(n)))
            offset += n
        row_dir = F.regexp_replace(
            F.regexp_replace(F.input_file_name(), r"/[^/]*$", ""),
            r"^[A-Za-z][A-Za-z0-9+.-]*:/+",
            "/",
        )
        salt = F.pmod(
            F.xxhash64(F.monotonically_increasing_id()),
            F.coalesce(F.element_at(F.create_map(*nf_entries), row_dir), F.lit(1)),
        )
        bucket = (
            F.coalesce(F.element_at(F.create_map(*off_entries), row_dir), F.lit(0))
            + salt
        )
        (
            df.withColumn("__compact_bucket", bucket)
            .repartitionByRange(part_target, "__compact_bucket")
            .drop("__compact_bucket")
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
    return CompactionReport(
        plan=plan,
        written_files=len(written),
        rows=rows,
        partitioned_target_files=part_target,
    )
