"""Data-layout management queries: small-file compaction and z-order
clustering — the table-maintenance operations a 100 TB lakehouse needs
between query runs (reference deploys onto GCS+BigQuery, where clustering
and file sizing are managed for you, `dags/config/pipeline_config.yaml`;
on open parquet the engine must provide them).

Both patterns must not change table CONTENT — only physical layout — so
each query returns the table content read back through the new layout and
the oracle is the equivalent plain SELECT. The layout effects (file
counts, files touched under a selective filter) are asserted in
tests/test_layout.py.
"""

from __future__ import annotations

import os
from functools import reduce

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.scratch import scratch_dir
from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans.registry import query

COMPACT_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


def compact_dir(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Rewrite a parquet directory into ≈``target_file_bytes`` files.

    The compaction planner's sizing decision is metadata-only: list file
    sizes (never read data) and pick the output file count. The rewrite
    itself is one pass. At 100 TB this runs per table-partition so each
    rewrite is bounded; the listing is the same driver-side metadata walk
    every table format's OPTIMIZE performs.

    Returns the compacted DataFrame reader (caller writes it back).
    """
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    return spark.read.parquet(path).repartition(n_out)


@query(
    "compact_small_files",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'P'
    """,
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout — small-file compaction: a slice landed as many tiny files
    (the streaming-ingest failure mode: one file per micro-batch) is
    rewritten into size-targeted files. Content is invariant — the oracle
    is the plain slice; file counts are asserted in tests."""
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(*COMPACT_COLS)
    )
    tmp = scratch_dir("compact")
    frag, tight = f"{tmp}/fragmented", f"{tmp}/compacted"
    # simulate micro-batch landings: 16 small files
    src.repartition(16).write.mode("overwrite").parquet(frag)
    compact_dir(spark, frag).write.mode("overwrite").parquet(tight)
    return spark.read.parquet(tight)


Z_BITS = 16


def zvalue_col(x, y, bits: int = Z_BITS):
    """Morton z-value: bit-interleave of two non-negative ints (x odd
    bits, y even bits). Inputs must already be normalized into
    ``bits``-bit range — production normalizes by quantile rank; the
    demo's dimensions fit natively. Pure JVM bitwise expressions: stays
    inside whole-stage codegen, no UDF."""
    return reduce(
        lambda acc, i: acc.bitwiseOR(
            x.bitwiseAND(F.lit(1 << i)).cast("long") * F.lit(1 << (i + 1))
        ).bitwiseOR(
            y.bitwiseAND(F.lit(1 << i)).cast("long") * F.lit(1 << i)
        ),
        range(bits),
        F.lit(0).cast("long"),
    )


@query(
    "zorder_layout",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 500
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout — z-order clustering: orders rewritten range-partitioned +
    sorted on the Morton interleave of (o_custkey, o_orderdate), then a
    2-D box filter read back through the layout. Content is invariant
    (the oracle is the plain box filter); the point of z-order is that
    BOTH dimensions cluster, so a selective box touches few files —
    asserted via input_file_name in tests.

    Scale: repartitionByRange samples the z-values for balanced splits
    (one exchange), sortWithinPartitions is a local sort — the standard
    one-pass OPTIMIZE ZORDER rewrite; min/max stats then prune at read.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    # normalize dims into 16-bit range: custkey is dense from 1; dates
    # sit ~8000-11000 days since epoch
    x = F.col("o_custkey").cast("long").bitwiseAND(F.lit((1 << Z_BITS) - 1))
    y = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .bitwiseAND(F.lit((1 << Z_BITS) - 1))
    )
    tmp = scratch_dir("zorder")
    (
        o.withColumn("zval", zvalue_col(x, y))
        .repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(f"{tmp}/orders_z")
    )
    return (
        spark.read.parquet(f"{tmp}/orders_z")
        .filter(
            F.col("o_custkey").between(100, 500)
            & (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )


@query(
    "time_travel_read",
    oracle="""
    WITH log AS (
        SELECT o_orderkey AS key, o_totalprice AS val,
               1 AS v, FALSE AS tombstone
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice + 1000.0, 2, FALSE
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, NULL, 3, TRUE
        FROM orders WHERE o_orderkey % 11 = 0),
    q AS (SELECT UNNEST([1, 2, 3]) AS asof_v),
    resolved AS (
        SELECT q.asof_v, log.key, log.val, log.v, log.tombstone,
               row_number() OVER (
                   PARTITION BY q.asof_v, log.key
                   ORDER BY log.v DESC) AS rn
        FROM log CROSS JOIN q
        WHERE log.v <= q.asof_v)
    SELECT asof_v,
           CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(SUM(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_updated,
           FLOOR(SUM(val) * 100.0 + 0.5) / 100.0 AS total_val
    FROM resolved
    WHERE rn = 1 AND NOT tombstone
    GROUP BY asof_v
    """,
)
def time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-extension — MVCC time-travel read over an append-only change
    log (the Delta/Iceberg snapshot-isolation pattern on plain
    parquet): the table is a log of (key, value, version, tombstone)
    rows; reading "as of version v" = filter `version <= v`, keep the
    latest version per key, drop tombstones. Version 1 is the base
    load, version 2 updates every 7th key, version 3 deletes every
    11th — the query resolves all three snapshots in one pass and
    returns per-snapshot live-row accounting.

    Scale: the log is append-only (no rewrite on update/delete — the
    write amplification win); resolution is one rank window per
    snapshot partitioned by key. Compaction (compact_small_files)
    periodically collapses resolved history; the version column doubles
    as the partition column so `v <= asof` prunes files."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("val"),
        F.lit(1).alias("v"),
        F.lit(False).alias("tombstone"),
    )
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice") + 1000.0).alias("val"),
            F.lit(2).alias("v"),
            F.lit(False).alias("tombstone"),
        )
    )
    deletes = (
        o.filter(F.col("o_orderkey") % 11 == 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.lit(None).cast("double").alias("val"),
            F.lit(3).alias("v"),
            F.lit(True).alias("tombstone"),
        )
    )
    log = base.unionByName(updates).unionByName(deletes)
    versions = spark.range(1, 4).select(F.col("id").cast("int").alias("asof_v"))
    from pyspark.sql.window import Window

    resolved = (
        log.crossJoin(F.broadcast(versions))
        .filter(F.col("v") <= F.col("asof_v"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("asof_v", "key").orderBy(F.col("v").desc())
            ),
        )
        .filter((F.col("rn") == 1) & (~F.col("tombstone")))
    )
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    return resolved.groupBy("asof_v").agg(
        F.count("*").alias("n_live"),
        F.sum(F.when(F.col("v") > 1, 1).otherwise(0)).alias("n_updated"),
        roundn(F.sum("val")).alias("total_val"),
    )


@query(
    "log_compact_retention",
    oracle="""
    WITH log AS (
        SELECT o_orderkey AS key, o_totalprice AS val,
               1 AS v, FALSE AS tombstone
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice + 1000.0, 2, FALSE
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, NULL, 3, TRUE
        FROM orders WHERE o_orderkey % 11 = 0),
    base AS (
        SELECT key, val, 2 AS v, tombstone,
               row_number() OVER (PARTITION BY key ORDER BY v DESC) AS rn
        FROM log WHERE v <= 2)
    SELECT key, FLOOR(val * 100.0 + 0.5) / 100.0 AS val, v, tombstone
    FROM base WHERE rn = 1 AND NOT tombstone
    UNION ALL
    SELECT key, FLOOR(val * 100.0 + 0.5) / 100.0, v, tombstone
    FROM log WHERE v > 2
    """,
)
def log_compact_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-extension — change-log compaction with a retention boundary:
    history at or below version ``v_min`` collapses to a single resolved
    base snapshot (latest value per key, fully-deleted keys dropped),
    while entries newer than ``v_min`` survive verbatim so every
    snapshot read `asof >= v_min` still resolves identically through
    `time_travel_read`'s rank window. This is the OPTIMIZE/VACUUM step
    that bounds the MVCC log's write amplification.

    Scale: one rank window over the retained-history slice keyed on the
    change key; the young tail is a pushed-down filter scan, never
    rewritten. The version column stays the partition column, so
    compaction prunes to `v <= v_min` files and later reads prune to
    their snapshot range."""
    V_MIN = 2
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("val"),
        F.lit(1).alias("v"),
        F.lit(False).alias("tombstone"),
    )
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice") + 1000.0).alias("val"),
        F.lit(2).alias("v"),
        F.lit(False).alias("tombstone"),
    )
    deletes = o.filter(F.col("o_orderkey") % 11 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast("double").alias("val"),
        F.lit(3).alias("v"),
        F.lit(True).alias("tombstone"),
    )
    log = base.unionByName(updates).unionByName(deletes)
    from pyspark.sql.window import Window

    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    old = log.filter(F.col("v") <= V_MIN)
    rn = F.row_number().over(Window.partitionBy("key").orderBy(F.col("v").desc()))
    compacted_base = (
        old.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (~F.col("tombstone")))
        .select(
            "key",
            roundn(F.col("val"), 2).alias("val"),
            F.lit(V_MIN).alias("v"),
            "tombstone",
        )
    )
    young = log.filter(F.col("v") > V_MIN).select(
        "key", roundn(F.col("val"), 2).alias("val"), "v", "tombstone"
    )
    return compacted_base.unionByName(young)


@query(
    "file_stats_manifest",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_orderdate) AS min_date,
           MAX(o_orderdate) AS max_date,
           FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def file_stats_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-extension — file-statistics manifest collection: after laying
    orders out month-partitioned (one file per month), scan once and
    record per-FILE min/max/count/sum keyed by ``input_file_name()`` —
    the zone-map/manifest tier that Delta/Iceberg keep in metadata and
    that data skipping (see zorder_layout's test) prunes against. The
    manifest is derived strictly from file grouping; because the layout
    put exactly one month in each file, it must equal the logical
    per-month aggregate — which is the oracle, keeping the check
    path-independent.

    Scale: stats collection is a single scan with map-side-combinable
    aggregates keyed on file — the same job shape as a compaction
    planner's; the manifest (one row per file) is metadata-sized and
    broadcastable to planners."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    tmp = scratch_dir("manifest")
    (
        o.withColumn("month", F.date_trunc("month", F.col("o_orderdate")))
        .repartition("month")  # one task owns each month → one file per dir
        .write.partitionBy("month")
        .mode("overwrite")
        .parquet(f"{tmp}/orders_m")
    )
    back = spark.read.parquet(f"{tmp}/orders_m")
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    per_file = back.groupBy(F.input_file_name().alias("file")).agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        roundn(F.sum("o_totalprice"), 2).alias("sum_price"),
    )
    return per_file.select(
        F.date_trunc("month", F.col("min_date")).alias("month"),
        "n_rows",
        "min_date",
        "max_date",
        "sum_price",
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering (r6e wave)
# ---------------------------------------------------------------------------

H_BITS = 16


def hilbert_index_np(x, y, bits: int = H_BITS):
    """Vectorized Hilbert xy2d (the classic per-bit rotate/flip walk,
    numpy over int64 arrays): maps the 2-D point to its position along
    the Hilbert curve.  Unlike the Morton interleave, CONSECUTIVE curve
    positions are always grid-ADJACENT (no z-shape jumps), which is why
    Hilbert clustering touches fewer files under box filters — the
    property the adjacency law test pins."""
    import numpy as np

    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate/flip the quadrant
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = (
            np.where(swap, y2, x2),
            np.where(swap, x2, y2),
        )
        s >>= 1
    return d


@query(
    "hilbert_layout",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 500
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout — HILBERT-CURVE clustering, z-order's locality-superior
    sibling (what Delta OPTIMIZE gained after ZORDER for exactly this
    reason): orders rewritten range-partitioned + sorted on the Hilbert
    index of (o_custkey, o_orderdate), then the same 2-D box filter as
    `zorder_layout` read back through the layout.  Content is invariant
    (the oracle is the plain box filter); the LAYOUT claim — every step
    along the curve is grid-adjacent, so a selective box touches no
    more (usually fewer) files than the Morton interleave whose z-jumps
    straddle range splits — is pinned by the adjacency and
    files-touched laws in tests/test_layout tier (test_wave_r6e).

    The index is an Arrow-batched pandas UDF (numpy per-bit
    rotate/flip): the curve math doesn't exist as a builtin, the column
    is computed ONCE per rewrite (not in any query path), and the
    bijection law cross-checks it against a scalar reference.

    100 TB: identical rewrite shape to zorder_layout —
    repartitionByRange samples the curve values for balanced splits
    (one exchange), sortWithinPartitions is local; min/max stats prune
    at read."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _hval(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            hilbert_index_np(x.to_numpy(), y.to_numpy(), H_BITS)
        )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    x = F.col("o_custkey").cast("long").bitwiseAND(F.lit((1 << H_BITS) - 1))
    y = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .bitwiseAND(F.lit((1 << H_BITS) - 1))
    )
    tmp = scratch_dir("hilbert")
    (
        o.withColumn("hval", _hval(x, y))
        .repartitionByRange(8, "hval")
        .sortWithinPartitions("hval")
        .drop("hval")
        .write.mode("overwrite")
        .parquet(f"{tmp}/orders_h")
    )
    return (
        spark.read.parquet(f"{tmp}/orders_h")
        .filter(
            F.col("o_custkey").between(100, 500)
            & (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )
