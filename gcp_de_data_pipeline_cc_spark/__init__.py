"""gcp_de_data_pipeline_cc_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (AdepuAdithya/gcp-de-data-pipeline-cc — an Airflow/
Dataflow/BigQuery/dbt Employee-ETL stack), re-expressed as one idiomatic
PySpark program surface:

- DataFrame/SQL transforms (Catalyst replaces the Beam + BigQuery optimizers)
- Structured Streaming for the file-arrival / archive lifecycle
  (replaces the GCS sensor + archive operators,
  reference dags/pipeline_orchestration_dag.py:79-95,188-206)
- plain Python sequencing (replaces the Airflow DAG spine,
  reference dags/pipeline_orchestration_dag.py:212)

plus the LLM-data-pipeline operator tier (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

See SURVEY.md for the full operator inventory this package implements.
"""

__version__ = "0.1.0"
