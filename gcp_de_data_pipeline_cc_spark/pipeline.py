"""End-to-end pipeline driver — the reference DAG spine as one program.

The reference orchestrates
``wait_files >> gcs_to_raw >> raw_to_staging >> data_quality >> run_dbt
>> archive`` across Airflow + Dataflow + BigQuery + dbt
(reference dags/pipeline_orchestration_dag.py:212). Here the same spine
is plain Python sequencing over DataFrame transforms — one process, one
IR; Spark's DAGScheduler handles all intra-query parallelism.

Stage map (reference file:line → here):

- sensor, 60 s poke / 3600 s timeout (dag:79-95)  → :func:`wait_for_files`
- gcs_to_raw Dataflow jobs (dag:101-119)          → raw tier write (CSV → all-string parquet)
- raw_to_staging Dataflow jobs (dag:125-143)      → typed staging write
- BigQueryCheckOperator gates (dag:149-167)       → quality.run_gates (raises on violation)
- dbt SCD2 curation model (dag:173-182, readme:10)→ scd2_init/scd2_apply on the employee⋈department snapshot
- GCSToGCSOperator archive with {{ds}} suffix (dag:188-206) → file move with load-date suffix
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.operators import quality as q
from gcp_de_data_pipeline_cc_spark.operators.scd2 import scd2_apply, scd2_init
from gcp_de_data_pipeline_cc_spark.sources.csv_ingest import (
    DEPARTMENT_COLUMNS,
    DEPARTMENT_STAGING_CASTS,
    EMPLOYEE_COLUMNS,
    EMPLOYEE_STAGING_CASTS,
    raw_to_staging,
    read_landing_csv,
)
from gcp_de_data_pipeline_cc_spark.sources.sink import read_table, write_table

LANDING_FILES = ("Employee.csv", "Department.csv")
CURATED_TABLE = "EmployeeDepartment_cur"
SCD2_KEYS = ["emp_id"]
SCD2_TRACKED = ["emp_name", "dept_id", "dept_name", "location", "salary", "hire_date"]


class SensorTimeout(TimeoutError):
    """Landing files did not appear within the timeout (sensor semantics,
    reference dags/config/pipeline_config.yaml:34-35)."""


@dataclass
class PipelineResult:
    raw_counts: dict[str, int] = field(default_factory=dict)
    staging_counts: dict[str, int] = field(default_factory=dict)
    gates: list[q.GateResult] = field(default_factory=list)
    curated_versions: int = 0
    archived: list[str] = field(default_factory=list)


def wait_for_files(
    landing_dir: str,
    files: tuple[str, ...] = LANDING_FILES,
    timeout_s: float = 3600.0,
    poke_interval_s: float = 60.0,
) -> None:
    """S5 — block until every landing file exists (batch sensor; the
    streaming path in streaming/file_ingest.py subsumes this for
    continuous deployments)."""
    deadline = time.monotonic() + timeout_s
    while True:
        missing = [f for f in files if not os.path.exists(os.path.join(landing_dir, f))]
        if not missing:
            return
        if time.monotonic() >= deadline:
            raise SensorTimeout(f"landing files never arrived: {missing}")
        time.sleep(min(poke_interval_s, max(deadline - time.monotonic(), 0.01)))


def _archive(landing_dir: str, load_date: dt.date) -> list[str]:
    """S6 — move processed files to archived/<file>.<ds> (reference
    destination_object suffix pattern, dag:195-204)."""
    archive_dir = os.path.join(landing_dir, os.pardir, "archived")
    os.makedirs(archive_dir, exist_ok=True)
    moved = []
    for f in LANDING_FILES:
        src = os.path.join(landing_dir, f)
        if os.path.exists(src):
            dst = os.path.join(archive_dir, f"{f}.{load_date.isoformat()}")
            shutil.move(src, dst)
            moved.append(dst)
    return moved


def _curated_path(warehouse_dir: str) -> str:
    return os.path.join(warehouse_dir, "cur", CURATED_TABLE)


def build_curation_snapshot(emp_stg: DataFrame, dept_stg: DataFrame) -> DataFrame:
    """The EmployeeDepartment join feeding the SCD2 model (the reference's
    dbt model input, dags/config/pipeline_config.yaml:90)."""
    return emp_stg.join(F.broadcast(dept_stg), "dept_id", "left").select(
        "emp_id", "emp_name", "dept_id", "dept_name", "location", "salary", "hire_date"
    )


def run_pipeline(
    spark: SparkSession,
    landing_dir: str,
    warehouse_dir: str,
    load_date: dt.date,
    sensor_timeout_s: float = 5.0,
    poke_interval_s: float = 0.1,
) -> PipelineResult:
    """One manual-trigger run of the full reference pipeline."""
    result = PipelineResult()

    # --- stage 0: sensor -------------------------------------------------
    wait_for_files(landing_dir, timeout_s=sensor_timeout_s, poke_interval_s=poke_interval_s)

    # --- stage 1: landing → raw (all-string + lineage) -------------------
    entities = {
        "Employee": (EMPLOYEE_COLUMNS, EMPLOYEE_STAGING_CASTS, ["emp_id"]),
        "Department": (DEPARTMENT_COLUMNS, DEPARTMENT_STAGING_CASTS, ["dept_id"]),
    }
    staged: dict[str, DataFrame] = {}
    for name, (cols, casts, required) in entities.items():
        raw = read_landing_csv(
            spark, os.path.join(landing_dir, f"{name}.csv"), cols, ingest_date=load_date
        )
        raw_path = os.path.join(warehouse_dir, "raw", f"{name}_raw")
        write_table(raw, raw_path)
        raw = read_table(spark, raw_path)
        result.raw_counts[name] = raw.count()

        # --- stage 2: raw → staging (typed + cleansed) -------------------
        stg = raw_to_staging(raw, casts, required=required).drop("ingest_date")
        stg_path = os.path.join(warehouse_dir, "stg", f"{name}_stg")
        write_table(stg, stg_path)
        staged[name] = read_table(spark, stg_path)
        result.staging_counts[name] = staged[name].count()

    # --- stage 3: quality gates (fail the run on violation) --------------
    emp, dept = staged["Employee"], staged["Department"]
    result.gates = q.run_gates([
        q.non_empty(emp, "employee_stg"),
        q.non_empty(dept, "department_stg"),
        q.unique_key(emp, ["emp_id"], "employee_stg"),
        q.unique_key(dept, ["dept_id"], "department_stg"),
        q.referential_integrity(emp, "dept_id", dept, "dept_id", "employee_stg"),
    ])

    # --- stage 4: curation (SCD2 merge) ----------------------------------
    snapshot = build_curation_snapshot(emp, dept)
    cur_path = _curated_path(warehouse_dir)
    if os.path.exists(cur_path):
        current = read_table(spark, cur_path)
        curated = scd2_apply(
            current, snapshot, SCD2_KEYS, SCD2_TRACKED, load_date, close_missing=True
        )
    else:
        curated = scd2_init(snapshot, SCD2_KEYS, SCD2_TRACKED, load_date)
    # write-then-swap: never overwrite the table still being read (and
    # never collect to the driver — the swap works at any scale)
    new_path = f"{cur_path}.load-{load_date.isoformat()}"
    write_table(curated, new_path)
    if os.path.exists(cur_path):
        shutil.rmtree(cur_path)
    shutil.move(new_path, cur_path)
    result.curated_versions = read_table(spark, cur_path).count()

    # --- stage 5: archive -------------------------------------------------
    result.archived = _archive(landing_dir, load_date)
    return result
