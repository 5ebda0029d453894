"""SparkSession factory and named-source registry.

Reference parity: base.go:38-66 ``Initialize(dbDriver, dbName)`` opens a
database handle for a (driver, database) pair read from ``.env``. Here a
*source* is a directory of Parquet tables registered as temp views in
the Spark catalog; ``dbDriver`` becomes a registry-name allowlist
(query_controller.go:46-51) and ``dbName`` selects the directory.

Scale posture: registration is metadata-only (Parquet footers); no data
moves until a query runs. On a real cluster the same registry would
point at object-store prefixes and persistent catalog tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from golang_db_query_engine_elasticsearch_indexer_spark.errors import (
    IncorrectDbDriverError,
    ParamsNullError,
)

# Tables the driver-generated fixture dirs contain (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Timestamp columns across fixture generations. Current fixtures store
# parquet TIMESTAMP(MICROS), which surfaces natively as timestamp_ntz
# (isAdjustedToUTC=false) — no conversion. Older generations stored
# TIMESTAMP(NANOS); with spark.sql.legacy.parquet.nanosAsLong those
# surface as LongType nanoseconds, and register_sf_dir converts them to
# timestamp_ntz. The conversion is gated on the SURFACED type (LongType),
# i.e. on the parquet footer — never on an assumed unit.
NANO_TS_COLUMNS = {"l_shipdate", "o_orderdate", "ts"}

#: Runtime confs the engine's semantics depend on — applied by
#: build_session AND by the driver contract's ``_configure`` onto a
#: stock session (one list, so the two can't drift):
#: UTC + NTZ keep timestamps oracle-comparable; nanosAsLong tolerates
#: TIMESTAMP(NANOS) fixture generations; AQE owns runtime re-planning;
#: the recursion cap covers the date-spine entry's one-level-per-day
#: recursion over any realistic span (default 100 would fail >100-day
#: tables at runtime while the uncapped DuckDB oracle succeeds).
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.timestampType": "TIMESTAMP_NTZ",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.cteRecursionLevelLimit": "36600",
    # Python Data Source filter pushdown (4.1 opt-in): the elastic
    # scroll reader translates Spark Filters into ES bool.filter
    # clauses; with this off Spark REFUSES any reader that implements
    # pushFilters (the reader offers .option("pushdown","false") as
    # the per-read escape hatch on foreign sessions).
    "spark.sql.python.filterPushdown.enabled": "true",
}


def build_session(
    app_name: str = "golang_db_query_engine_elasticsearch_indexer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession with the engine's defaults.

    Local-mode knobs follow the test environment (local[N] single JVM);
    the AQE/shuffle settings are the ones that matter at cluster scale:
    AQE re-plans joins and coalesces/splits shuffle partitions at
    runtime, which is what keeps a fixed ``shuffle.partitions`` from
    being wrong at 1000x the data.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


class SourceRegistry:
    """Named source backends behind one parameter.

    Replaces the reference's ``dbDriver``/``dbName`` pair
    (query_controller.go:55-58 + base.go:38-66). ``drivers`` is the
    allowlist; each driver maps ``db_name -> parquet directory``.
    """

    def __init__(self) -> None:
        self._drivers: dict[str, dict[str, str]] = {"parquet": {}}

    def register_driver(self, driver: str) -> None:
        self._drivers.setdefault(driver, {})

    def register_source(self, driver: str, db_name: str, path: str) -> None:
        if driver not in self._drivers:
            raise IncorrectDbDriverError(f"Incorrect database driver provided: {driver!r}")
        self._drivers[driver][db_name] = path

    def validate_driver(self, driver: str) -> None:
        """Parity with dbDriverValidator (query_controller.go:46-51)."""
        if not driver:
            raise ParamsNullError()
        if driver not in self._drivers:
            raise IncorrectDbDriverError(f"Incorrect database driver provided: {driver!r}")

    def resolve(self, driver: str, db_name: str) -> str:
        self.validate_driver(driver)
        if not db_name:
            raise ParamsNullError()
        try:
            return self._drivers[driver][db_name]
        except KeyError:
            raise IncorrectDbDriverError(
                f"Unknown database {db_name!r} for driver {driver!r}"
            ) from None

    def attach(self, spark: SparkSession, driver: str, db_name: str) -> None:
        """Register the source's tables as temp views (metadata only)."""
        register_sf_dir(spark, self.resolve(driver, db_name))


def default_registry() -> SourceRegistry:
    """Registry preloaded with the driver fixture scale factors."""
    reg = SourceRegistry()
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}"
        if os.path.isdir(path):
            reg.register_source("parquet", f"sf{sf}", path)
    return reg


# Per-session registration memo: (session, sf_dir, tables) of the last
# registration, so back-to-back queries against the SAME fixture dir
# skip the ~0.7 s of footer reads + view DDL round-trips (measured: the
# dominant fixed cost of every driver-contract call — the q1 plan itself
# runs in 0.23 s). Switching sf_dir (or passing force=True) re-registers,
# so the contract's dir-switching behavior is unchanged. WeakKeyDict so
# a stopped session doesn't pin its DataFrames.
import weakref

_REGISTERED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

#: Column names of every table register_sf_dir has registered, by
#: name — the single source of truth the ES|QL compile-time schema
#: map (operators/esql._TABLE_COLUMNS) overlays on its footer-derived
#: defaults, so a newly registered table is multi-index-addressable
#: with no literal edit (VERDICT r11 ask #2).
TABLE_COLUMNS: dict[str, list[str]] = {}

#: Per-table columns whose cast-to-STRING rendering is bit-identical
#: across Spark and DuckDB (integers, strings, booleans, dates,
#: decimals — NOT floats/timestamps/arrays, whose text forms can
#: diverge between engines). The multi-index UNION ALL's ``_uid``
#: whole-row hash (operators/esql.union_all_sql; ADVICE r12 medium:
#: first-column _uid wasn't unique) hashes exactly these columns so
#: the id is unique per distinct row AND cross-engine deterministic.
TABLE_UID_SAFE: dict[str, list[str]] = {}


def register_sf_dir(
    spark: SparkSession,
    sf_dir: str,
    tables=FIXTURE_TABLES,
    force: bool = False,
) -> dict[str, DataFrame]:
    """Register every fixture table under ``sf_dir`` as a temp view.

    Reads only Parquet footers — safe at any scale. Missing tables are
    skipped so partial fixture dirs still register. Idempotent calls
    (same session + sf_dir + tables) return the memoized registration;
    pass ``force=True`` after replacing views out-of-band.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    uid_safe_types = (
        ByteType, ShortType, IntegerType, LongType,
        StringType, BooleanType, DateType, DecimalType,
    )

    memo = _REGISTERED.get(spark)
    if not force and memo is not None and memo[0] == (sf_dir, tuple(tables)):
        return memo[1]

    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        for f_ in df.schema.fields:
            if f_.name in NANO_TS_COLUMNS and isinstance(f_.dataType, LongType):
                df = df.withColumn(
                    f_.name,
                    F.timestamp_micros(F.expr(f"{f_.name} div 1000")).cast("timestamp_ntz"),
                )
        df.createOrReplaceTempView(name)
        out[name] = df
        TABLE_COLUMNS[name] = [f_.name for f_ in df.schema.fields]
        TABLE_UID_SAFE[name] = [
            f_.name for f_ in df.schema.fields
            if isinstance(f_.dataType, uid_safe_types)
        ]
    _REGISTERED[spark] = ((sf_dir, tuple(tables)), out)
    return out


def invalidate_registration(spark: SparkSession) -> None:
    """Drop the registration memo for ``spark`` so the next
    ``register_sf_dir`` call re-registers unconditionally. Called by
    any code path that creates/replaces temp views OUT-OF-BAND of the
    fixture registry (e.g. ``sources.register_dir``) — otherwise a
    memo hit would leave a clobbered same-named view in place."""
    _REGISTERED.pop(spark, None)
