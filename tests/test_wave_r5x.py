"""Semantic laws for the r5x wave: sentence segmentation + RTBF purge
cascade."""

from __future__ import annotations

import datetime
import hashlib

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# text_sentence_split
# --------------------------------------------------------------------------


def test_sentence_split_lead_in_traps_always_corrected(spark):
    out = REGISTRY["text_sentence_split"].spark(spark, SF_DIR).toPandas()
    # the lead-in plants exactly two abbreviation traps per doc
    # ('Dr. ' and 'al. '); corpus words never end in '.', so no more
    assert (out.n_abbrev >= 2).all()
    assert (out.n_sentences >= 1).all()
    assert (out.n_sentences == out.n_boundaries_naive - out.n_abbrev).all()
    assert (out.mean_sentence_tokens > 0).all()


def test_sentence_split_known_counts(spark, tmp_path):
    texts = [
        # 'table' twice and 'query' once -> 3 planted boundaries + the
        # terminal '.' = 4 sentences; +2 abbreviation traps for naive
        "a table b table c query d",
        # no planted boundaries: just the lead-in colon text + final '.'
        "plain words only",
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["text_sentence_split"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_abbrev"] == 2
    assert out.loc[0, "n_boundaries_naive"] == 6  # 2 traps + 3 + final
    assert out.loc[0, "n_sentences"] == 4
    assert out.loc[1, "n_abbrev"] == 2
    assert out.loc[1, "n_sentences"] == 1


# --------------------------------------------------------------------------
# ops_rtbf_purge
# --------------------------------------------------------------------------


def _requested(custkey):
    return hashlib.md5(f"rtbf:{custkey}".encode()).hexdigest()[:2] < "08"


def test_rtbf_cascade_counts_match_python(spark):
    import duckdb

    out = (
        REGISTRY["ops_rtbf_purge"].spark(spark, SF_DIR).toPandas()
        .set_index("table_name")
    )
    custs = duckdb.sql(
        f"SELECT c_custkey FROM '{SF_DIR}/customer.parquet'"
    ).fetchall()
    req = {k for (k,) in custs if _requested(k)}
    orders = duckdb.sql(
        f"SELECT o_orderkey, o_custkey FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    o_purge = {ok for ok, ck in orders if ck in req}
    lines = duckdb.sql(
        f"SELECT l_orderkey FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    l_purge = sum(1 for (ok,) in lines if ok in o_purge)
    assert out.loc["customer", "rows_purged"] == len(req)
    assert out.loc["orders", "rows_purged"] == len(o_purge)
    assert out.loc["lineitem", "rows_purged"] == l_purge
    assert (
        out.rows_after == out.rows_before - out.rows_purged
    ).all()
    # naive customer-only delete orphans every purged child row
    assert out.loc["orders", "orphans_if_naive"] == len(o_purge)
    assert out.loc["lineitem", "orphans_if_naive"] == l_purge
    assert out.loc["customer", "orphans_if_naive"] == 0


def test_rtbf_orphan_audit_catches_broken_cascade(spark, tmp_path):
    # customer 11 hashes into the request set (verified below);
    # customer 9999 does not.  One order each; the purged order has
    # 2 lines.
    assert _requested(11)
    assert not _requested(9999)
    spark.createDataFrame(
        [(11,), (9999,)], "c_custkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [
            (100, 11, "O", 1.0, datetime.datetime(2024, 1, 1), "1-A"),
            (200, 9999, "O", 1.0, datetime.datetime(2024, 1, 1), "1-A"),
        ],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [
            (100, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             datetime.datetime(2024, 1, 1)),
            (100, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
             datetime.datetime(2024, 1, 1)),
            (200, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             datetime.datetime(2024, 1, 1)),
        ],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = (
        REGISTRY["ops_rtbf_purge"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("table_name")
    )
    assert out.loc["customer", "rows_purged"] == 1
    assert out.loc["orders", "rows_purged"] == 1
    assert out.loc["lineitem", "rows_purged"] == 2
    # a customer-only delete would orphan 1 order and 2 lines — the
    # audit columns expose exactly the rows a broken cascade leaves
    assert out.loc["orders", "orphans_if_naive"] == 1
    assert out.loc["lineitem", "orphans_if_naive"] == 2
    assert out.loc["customer", "rows_after"] == 1
    assert out.loc["orders", "purge_rate"] == 0.5
