"""Semantic laws for the r5s wave: HTML main-text extraction +
Cramér's V categorical association matrix."""

from __future__ import annotations

import datetime
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# text_html_extract
# --------------------------------------------------------------------------


def test_html_extract_roundtrip_and_script_containment(spark):
    out = REGISTRY["text_html_extract"].spark(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # main-content extraction recovers the embedded doc byte-for-byte
    assert out.roundtrip_ok.all()
    # naive tag-stripping leaks the script body; main extraction never does
    assert out.naive_script_leak.all()
    assert not out.main_script_leak.any()
    # boilerplate (nav + h1 + footer + script/style payloads) makes naive
    # strictly longer than main on every row
    assert (out.n_naive > out.n_main).all()


def test_html_extract_entity_channel_exact_inverse(spark, tmp_path):
    # plant the characters the escape/unescape chain must survive,
    # including a pre-escaped literal '&lt;' in the source and multiple
    # paragraph-split tokens.
    texts = [
        "a < b & c > d",
        "literal &lt; stays literal",
        "one table two table three",
        "x",
        "tag soup <p> inside & more",
    ]
    rows = [(i, t, "en", "synthetic", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["text_html_extract"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.roundtrip_ok.all(), out
    assert not out.main_script_leak.any()
    # doc 2 has two ' table ' splits -> 2 extra <p> pairs beyond the
    # template's 16 fixed tags on doc 0 (no splits)
    assert out.loc[2, "tag_count"] == out.loc[0, "tag_count"] + 4


# --------------------------------------------------------------------------
# stats_cramers_v
# --------------------------------------------------------------------------


def _orders(spark, path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def test_cramers_v_perfect_association_is_one(spark, tmp_path):
    # status is a bijection of priority -> V = 1 exactly; month
    # alternates independently so the month pairs stay well-defined.
    rows = []
    mapping = {"1-A": "F", "2-B": "O", "3-C": "P"}
    k = 0
    for pri, st in mapping.items():
        for i in range(40):
            ts = datetime.datetime(2024, 1 + (k % 2), 1)
            rows.append((k, 1, st, 10.0, ts, pri))
            k += 1
    _orders(spark, tmp_path, rows)
    out = (
        REGISTRY["stats_cramers_v"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("pair")
    )
    assert out.loc["status_priority", "v"] == 1.0
    assert out.loc["status_priority", "dof"] == 4
    # bias-corrected V is <= plain V and stays near 1
    assert 0.9 <= out.loc["status_priority", "v_corrected"] <= 1.0


def test_cramers_v_independence_clamps_to_zero(spark, tmp_path):
    # uniform grid: every (status, priority, month) cell equal ->
    # chi2 = 0, v = 0, and the bias-corrected V clamps at 0.
    rows = []
    k = 0
    for st in ["F", "O"]:
        for pri in ["1-A", "2-B"]:
            for mo in [1, 2]:
                for i in range(25):
                    rows.append(
                        (k, 1, st, 10.0,
                         datetime.datetime(2024, mo, 1), pri)
                    )
                    k += 1
    _orders(spark, tmp_path, rows)
    out = (
        REGISTRY["stats_cramers_v"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("pair")
    )
    for pair in out.index:
        assert out.loc[pair, "chi2"] == 0.0
        assert out.loc[pair, "v"] == 0.0
        assert out.loc[pair, "v_corrected"] == 0.0


def test_cramers_v_matches_python_recompute(spark):
    import duckdb

    out = (
        REGISTRY["stats_cramers_v"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("pair")
    )
    cells = duckdb.sql(
        f"""
        SELECT o_orderstatus a, o_orderpriority b, COUNT(*) o
        FROM '{SF_DIR}/orders.parquet' GROUP BY 1, 2
        """
    ).df()
    n = cells.o.sum()
    rt = cells.groupby("a").o.sum().to_dict()
    ct = cells.groupby("b").o.sum().to_dict()
    obs = {(row.a, row.b): row.o for _, row in cells.iterrows()}
    chi2 = 0.0
    for a in rt:
        for b in ct:
            e = rt[a] * ct[b] / n
            chi2 += (obs.get((a, b), 0) - e) ** 2 / e
    r, c = len(rt), len(ct)
    v = math.sqrt(chi2 / (n * min(r - 1, c - 1)))
    got = out.loc["status_priority"]
    assert abs(got.chi2 - chi2) < 1e-3
    assert abs(got.v - v) < 1e-5
    assert got.r == r and got.c == c and got.n == n
