"""Warehouse table sinks (op S4).

The reference's Dataflow jobs overwrite BigQuery raw/staging tables per
run (reference dags/pipeline_orchestration_dag.py:108,117,132,141). Here
a sink is a Parquet (or any Spark-format) write; on GCP deployment the
format string becomes ``bigquery``/``gcs`` — config, not architecture.

Scale posture: always partition big fact sinks (``partition_by``) so
downstream reads prune; writer tasks scale with upstream partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    fmt: str = "parquet",
) -> None:
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
