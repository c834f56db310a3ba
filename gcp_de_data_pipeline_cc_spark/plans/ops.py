"""Orchestration-ops wave: the Airflow backfill planner.

The reference IS an orchestrator — its DAG re-runs failed/missing
partition loads via Airflow backfills (dags/pipeline_orchestration_dag
.py:212 schedule + catchup semantics; the sensor at :79-95 gates each
daily partition). The operational query behind that workflow:

**ops_backfill_plan** — diff the SOURCE feed's day spine against the
STAGED replica's loaded partitions and emit the minimal set of
CONTIGUOUS day ranges to re-run (`airflow dags backfill -s start -e
end` takes ranges, not day lists). Missing days collapse to ranges via
the gaps-and-islands row_number difference (win_islands' primitive,
applied to the calendar anti-join).

The staged replica is REAL: the query writes a parquet copy of the
events feed to scratch, minus an injected 3-day outage window and the
2-day late-arriving tail, then reads it back and plans the backfill —
so the parquet round-trip, the anti-join, and the range assembly are
all exercised end-to-end. The DuckDB oracle recomputes the same staged
predicate relationally (it cannot see the scratch dir — the Spark side
additionally proves the write/read path).

100 TB scale: both sides collapse to DISTINCT loaded days before any
comparison — the diff runs over day-cardinality rows (the partition
MANIFEST, exactly what a lakehouse table format exposes without
scanning data at all; `file_stats_manifest` is that direct form). The
islands window orders the missing-day table: bounded by the calendar,
not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans.registry import query
from gcp_de_data_pipeline_cc_spark.scratch import scratch_dir

#: injected outage: days [min+_OUT_LO, min+_OUT_HI] missing from staging
_OUT_LO, _OUT_HI = 9, 11

#: late-arriving tail: the last _TAIL days haven't landed yet
_TAIL = 2


@query(
    "ops_backfill_plan",
    oracle=f"""
    WITH src AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM src),
    staged AS (
        SELECT s.day FROM src s, bounds
        WHERE s.day NOT BETWEEN bounds.d0 + INTERVAL {_OUT_LO} DAY
                            AND bounds.d0 + INTERVAL {_OUT_HI} DAY
          AND s.day <= bounds.d1 - INTERVAL {_TAIL} DAY),
    spine AS (
        SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds),
    missing AS (
        SELECT day FROM spine
        WHERE day NOT IN (SELECT day FROM staged)),
    grp AS (
        SELECT day,
               day - CAST(row_number() OVER (ORDER BY day) AS INTEGER)
                   AS grp_key
        FROM missing)
    SELECT MIN(day) AS range_start, MAX(day) AS range_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM grp GROUP BY grp_key
    ORDER BY range_start
    """,
)
def ops_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner: stage the events feed to scratch parquet minus
    an outage window and the late tail, read it back, anti-join the
    calendar spine, and collapse missing days into contiguous
    re-run ranges (gaps-and-islands)."""
    ev = load_table(spark, sf_dir, "events")
    src_days = ev.select(F.to_date("ts").alias("day")).distinct()
    src_days = src_days.localCheckpoint(eager=False)  # bounds + spine + stage
    d0, d1 = src_days.agg(F.min("day"), F.max("day")).first()

    # land the staged replica (full rows, partition-pruned predicate) —
    # a REAL parquet round trip, not a relational simulation
    staged_path = scratch_dir("ops_backfill_plan")
    ev.filter(
        ~F.to_date("ts").between(
            F.date_add(F.lit(d0), _OUT_LO), F.date_add(F.lit(d0), _OUT_HI)
        )
        & (F.to_date("ts") <= F.date_sub(F.lit(d1), _TAIL))
    ).write.mode("overwrite").parquet(staged_path)
    staged_days = (
        spark.read.parquet(staged_path)
        .select(F.to_date("ts").alias("day"))
        .distinct()
    )

    spine = spark.sql(
        "SELECT explode(sequence(to_date('{0}'), to_date('{1}'), "
        "interval 1 day)) AS day".format(d0.isoformat(), d1.isoformat())
    )
    missing = spine.join(staged_days, "day", "left_anti")
    # islands over the ≤|calendar| missing-day rows
    w = Window.orderBy("day")
    grp = missing.withColumn(
        "grp_key", F.datediff(F.col("day"), F.lit(d0)) - F.row_number().over(w)
    )
    return (
        grp.groupBy("grp_key")
        .agg(
            F.min("day").alias("range_start"),
            F.max("day").alias("range_end"),
            F.count("*").alias("n_days"),
        )
        .drop("grp_key")
        .orderBy("range_start")
    )
