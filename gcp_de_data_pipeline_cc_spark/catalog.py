"""Table catalog over the warehouse directory.

The reference keeps its warehouse as three BigQuery datasets (raw →
staging → curation, reference dags/config/pipeline_config.yaml:43-46);
here a warehouse is simply a directory of columnar tables, and tiering is
a naming/partitioning convention. In deployment the same code points at
object-store URIs — the connector is a config string, not architecture.

Physical notes for the 100 TB design point:

- Parquet columnar at rest; scans get column pruning + predicate pushdown
  from Catalyst for free (verify via ``df.explain``: ``ReadSchema`` /
  ``PushedFilters``).
- `events.ts` lands as parquet TIMESTAMP(NANOS) which Spark's reader
  maps to LongType under ``spark.sql.legacy.parquet.nanosAsLong``; the
  catalog normalizes it to microsecond TimestampType — the exact
  truncation DuckDB applies, so both engines see identical instants.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

#: every table the test warehouse carries (TESTDATA.md)
TABLES = (
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

#: small dimension tables — always broadcast-eligible in joins. At 100 TB
#: the facts (orders/lineitem/events/documents/embeddings) grow; these stay
#: dimension-sized (region=5, nation=25, supplier/part/customer grow slowly).
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: runtime-settable SQL confs the engine's semantics depend on; enforced
#: here so results are correct even on a SparkSession built elsewhere
#: (e.g. the verification driver's own session).
_REQUIRED_SQL_CONFS = {
    # instant semantics must match the oracle engine (naive UTC)
    "spark.sql.session.timeZone": "UTC",
    # events.ts is parquet TIMESTAMP(NANOS); legacy readers need this to
    # scan it at all (as raw longs). Newer readers map nanos natively to
    # TIMESTAMP_NTZ and ignore this conf — load_table normalizes both.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_session_posture(spark: SparkSession) -> None:
    """Idempotently apply the SQL confs correctness depends on."""
    for key, want in _REQUIRED_SQL_CONFS.items():
        if spark.conf.get(key, None) != want:
            spark.conf.set(key, want)


def table_fingerprint(sf_dir: str, name: str) -> tuple:
    """Cheap content fingerprint of one warehouse table: the sorted
    (relative-path, mtime_ns, size) of its parquet file(s).  Session
    caches key on this so a table REWRITTEN at the same path within one
    Spark application (the test-suite overwrite pattern) invalidates the
    cache instead of silently serving frames built on stale data."""
    base = os.path.join(sf_dir, f"{name}.parquet")
    entries = []
    if os.path.isdir(base):
        for root, _, files in os.walk(base):
            for fn in sorted(files):
                p = os.path.join(root, fn)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                entries.append(
                    (os.path.relpath(p, base), st.st_mtime_ns, st.st_size)
                )
    else:
        try:
            st = os.stat(base)
            entries.append((name, st.st_mtime_ns, st.st_size))
        except OSError:
            pass
    return tuple(sorted(entries))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one warehouse table, normalizing physical quirks.

    Column normalization happens *after* the scan node, so pushdown and
    pruning still reach the parquet reader for every other column.
    """
    ensure_session_posture(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a CPU-heavy narrow relation across the session's full
    parallelism when the upstream scan under-splits (guide §2.5's
    "input skew: one huge unsplittable file … repartition immediately
    after the read").

    Local warehouses are single-row-group parquet files, so a scan
    yields 1–3 tasks and a per-row-expensive projection (format
    parsing, regex batteries, hashing, n-gram explode) serializes on
    one core.  At production split counts the scan already carries
    ≥ defaultParallelism partitions and this is a NO-OP — the check is
    evaluated once at plan-build time, so no exchange is added to the
    100 TB plan.  Round-robin repartition is used (no key: the inputs
    feeding this are deterministic scans, safe under retry per
    SPARK-23207's sort-before-repartition).

    Planning cost (r9 ADVICE): the ``df.rdd.getNumPartitions()`` probe
    forces analysis + physical planning of ``df`` (and file listing at
    the scan) at plan-BUILD time, and freezes a pre-AQE partition
    count.  Both are acceptable exactly because every call site is a
    plan ROOT over a fresh scan (listing is cached per session; the
    pre-AQE count IS the scan split count being tested) — do NOT call
    this inside iterative loops or on deep mid-plan relations.
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` (parquet TIMESTAMP(NANOS)) to micros
    TimestampType, whichever way the reader surfaced it.

    Legacy readers (``nanosAsLong=true``) produce raw nano longs;
    truncate to micros (integer div — matches DuckDB's ns→us
    truncation). Newer readers map nanos natively to micros
    TIMESTAMP_NTZ; cast to TimestampType — an exact reinterpretation
    under the UTC session timezone — so every consumer (watermarks,
    unix_micros, window ranges) sees one type either way. Works on both
    batch and streaming DataFrames.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class Warehouse:
    """Convenience handle over one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql access."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
