"""Semantic laws for the r5d wave: Arrow-native UDF/UDTF rungs."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_arrow_scalar_matches_builtin_expression(spark):
    # the Arrow kernel must agree bit-for-bit with the JVM expression
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic feed, so
    # compare sorted multisets rather than joining
    out = (
        REGISTRY["udf_arrow_scalar"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber", "net_cents"])
        .reset_index(drop=True)
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    builtin = (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * F.lit(100.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("net_cents"),
        )
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber", "net_cents"])
        .reset_index(drop=True)
    )
    assert out.equals(builtin)


def test_arrow_udtf_tokenizes_positionally(spark):
    out = REGISTRY["udtf_arrow_batch"].spark(spark, SF_DIR).toPandas()
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        f"WHERE doc_id % 50 = 0"
    ).df()
    assert set(out.doc_id) == set(docs.doc_id)
    for _, d in docs.head(10).iterrows():
        toks = d.text.split(" ")
        got = out[out.doc_id == d.doc_id].sort_values("pos")
        assert list(got.tok) == toks
        assert list(got.pos) == list(range(1, len(toks) + 1))
    # token totals reconcile
    assert len(out) == int(docs.text.str.split(" ").str.len().sum())
