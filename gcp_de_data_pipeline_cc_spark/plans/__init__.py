"""Query plan catalog.

Every operator from SURVEY.md §2 is registered here as a named
:class:`~gcp_de_data_pipeline_cc_spark.plans.registry.QuerySpec` pairing a
DataFrame-first Spark implementation with (where SQL-expressible) an ANSI
SQL oracle that DuckDB can execute over the same parquet tables.

Importing this package populates the registry.
"""

from gcp_de_data_pipeline_cc_spark.plans.registry import REGISTRY, QuerySpec, query

# registration side effects
from gcp_de_data_pipeline_cc_spark.plans import (  # noqa: E402,F401
    abtest,
    analytics,
    analytics2,
    analytics3,
    analytics4,
    analytics5,
    analytics6,
    analytics7,
    analytics8,
    corpus,
    corpus2,
    corpus3,
    corpus4,
    corpus5,
    corpus6,
    corpus7,
    corpus8,
    corpus_stats,
    curation,
    evals,
    events,
    graph,
    graph2,
    layout,
    lifecycle,
    llm,
    multimodal2,
    ops,
    pipeline_e2e,
    pipeline_ops,
    privacy,
    recsys,
    relational,
    relational_ext,
    relational_ext2,
    relational_ext3,
    relational_ext4,
    relational_ext5,
    relational_ext6,
    relational_ext7,
    relational_ext8,
    retrieval,
    retrieval2,
    scale,
    sketches,
    stats,
    stats2,
    stats3,
    stats4,
    stats5,
    stats6,
    timeseries,
    timeseries2,
    timeseries3,
    timeseries4,
    timeseries5,
    timeseries6,
    timeseries7,
    timeseries8,
    training,
    udfs,
)

# imported after the signal modules: its oracle nests theirs
from gcp_de_data_pipeline_cc_spark.plans import quality_composite  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
