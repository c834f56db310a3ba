"""Landing-CSV ingest: the reference's raw → staging two-step.

The reference lands ``Employee.csv`` / ``Department.csv`` in a bucket
prefix and runs two external Dataflow jobs per entity: file → raw table,
raw table → typed staging table (reference
dags/pipeline_orchestration_dag.py:101-143; file patterns at
dags/config/pipeline_config.yaml:33,38). The raw tier is conventionally
all-string; staging applies types and cleansing (reference readme:7-9).

Here both steps are DataFrame transforms:

- :func:`read_landing_csv` — explicit all-string schema (never
  ``inferSchema`` in a production path: inference is an extra full scan
  and non-deterministic under dirty data), one ``ingest_date`` lineage
  column.
- :func:`raw_to_staging` — declarative cast map + trim/cleanse, invalid
  rows quarantined instead of dropped silently.

Scale: CSV scans parallelize per-file and per-split; schema is fixed so
the scan is single-pass. The cast map compiles to Catalyst expressions —
no Python row loop.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: minimal plausible entity schemas consistent with the orchestration
#: contract (FIXTURES.md §B) — raw tier is all-string by convention.
EMPLOYEE_COLUMNS = ("emp_id", "emp_name", "dept_id", "salary", "hire_date")
DEPARTMENT_COLUMNS = ("dept_id", "dept_name", "location")

EMPLOYEE_STAGING_CASTS: Mapping[str, str] = {
    "emp_id": "bigint",
    "emp_name": "string",
    "dept_id": "bigint",
    "salary": "double",
    "hire_date": "date",
}
DEPARTMENT_STAGING_CASTS: Mapping[str, str] = {
    "dept_id": "bigint",
    "dept_name": "string",
    "location": "string",
}


def all_string_schema(columns: Sequence[str]) -> StructType:
    return StructType([StructField(c, StringType(), True) for c in columns])


def read_landing_csv(
    spark: SparkSession,
    path: str,
    columns: Sequence[str],
    ingest_date: dt.date | None = None,
) -> DataFrame:
    """Raw-tier read: all columns as nullable strings + lineage column.

    ``mode=PERMISSIVE`` keeps malformed rows (they surface as nulls and
    are quarantined at the staging step) — the pipeline never dies on one
    bad line, mirroring the reference's stage-isolation posture.
    """
    df = (
        spark.read.schema(all_string_schema(columns))
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    stamp = F.lit(ingest_date) if ingest_date else F.current_date()
    return df.withColumn("ingest_date", stamp)


def raw_to_staging(
    raw: DataFrame,
    casts: Mapping[str, str],
    required: Sequence[str] = (),
) -> DataFrame:
    """Staging-tier transform: trim strings, apply the cast map, and keep
    only rows whose ``required`` columns cast successfully.

    Uses ``try_cast`` semantics (``expr("try_cast(..)")``) so dirty
    values become nulls instead of failing the job under ANSI mode.
    """
    out = raw
    for col, dtype in casts.items():
        cleaned = F.trim(F.col(col))
        if dtype == "string":
            out = out.withColumn(col, cleaned)
        else:
            out = out.withColumn(
                col, F.expr(f"try_cast(trim({col}) AS {dtype})")
            )
    for col in required:
        out = out.filter(F.col(col).isNotNull())
    return out


def quarantine(
    raw: DataFrame,
    casts: Mapping[str, str],
    required: Sequence[str],
) -> DataFrame:
    """The complement of :func:`raw_to_staging`'s filter: rows that failed
    a required cast or carry a null required value, kept for inspection
    (cleansing QC, readme:9). Empty ``required`` → empty quarantine."""
    pred = F.lit(False)
    for col in required:
        dtype = casts[col]
        pred = pred | F.col(col).isNull()
        if dtype != "string":
            pred = pred | (
                F.col(col).isNotNull()
                & F.expr(f"try_cast(trim({col}) AS {dtype})").isNull()
            )
    return raw.filter(pred)
