"""Incremental file ingest (ops S5/S6/T1).

The reference polls a bucket for landing files with a 60 s sensor
(reference dags/pipeline_orchestration_dag.py:79-95), processes them, and
moves them to ``archived/<file>.<ds>`` on success (``:188-206``).
Structured Streaming's file source subsumes all three behaviors natively:

- *sensor* → the source discovers new files each micro-batch (or
  ``trigger(availableNow=True)`` for the reference's manual-trigger,
  drain-everything semantics, dags/pipeline_orchestration_dag.py:66,70);
- *exactly-once* → the checkpoint records processed files, so re-runs
  never double-ingest (the reference gets this only by archiving);
- *archive* → ``cleanSource=archive`` moves consumed files to
  ``sourceArchiveDir`` after commit.

Scale: file listing is incremental (``maxFilesPerTrigger`` bounds batch
size); state is file-log only, no row state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from gcp_de_data_pipeline_cc_spark.sources.csv_ingest import all_string_schema


def landing_stream(
    spark: SparkSession,
    landing_dir: str,
    columns: Sequence[str],
    archive_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a landing directory of CSVs (raw tier, all-string
    + ingest timestamp lineage)."""
    reader = (
        spark.readStream.schema(all_string_schema(columns))
        .option("header", "true")
    )
    if archive_dir is not None:
        reader = (
            reader.option("cleanSource", "archive")
            .option("sourceArchiveDir", archive_dir)
        )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.csv(landing_dir)
    return df.withColumn("ingest_ts", F.current_timestamp())


def ingest_available_now(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Drain everything currently in the landing dir into the raw tier and
    stop — the exact semantics of one manual reference-DAG run (sensor →
    ingest → archive), with checkpointed exactly-once on top."""
    return (
        stream.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
