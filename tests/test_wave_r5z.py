"""Semantic laws for the r5z wave: reward length-bias audit +
User-Agent forensics."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# eval_reward_length_bias
# --------------------------------------------------------------------------


def test_length_bias_hash_reward_is_unbiased(spark):
    out = REGISTRY["eval_reward_length_bias"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 10
    assert list(out.sort_values("decile").decile) == list(range(10))
    # deciles are equal-population (within one)
    assert out.n_docs.max() - out.n_docs.min() <= 1
    # the md5 reward cannot correlate with length
    assert abs(out["corr"].iloc[0]) < 0.1
    # mean_len strictly increases across length deciles
    ml = list(out.sort_values("decile").mean_len)
    assert all(a <= b for a, b in zip(ml, ml[1:]))


def test_length_bias_planted_verbosity_detected(spark, tmp_path):
    # reward == length is the pathological judge; corr must hit 1 and
    # the decile mean-reward ladder must be strictly monotone.
    # (documents n_chars drives x; we cannot plant y directly, so plant
    # a corpus whose md5 reward we OVERRIDE by construction: instead,
    # verify the detector on x==x via slope units using a linear
    # transform of length as the reward channel is fixed — so here we
    # check the DECILE machinery: lengths 1..200 give exact deciles.)
    rows = [(i, "t" * (i + 1), "en", "s", i + 1) for i in range(200)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["eval_reward_length_bias"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("decile")
    )
    assert (out.n_docs == 20).all()
    # decile d holds lengths 20d+1..20d+20 -> integer mean 20d+10
    assert list(out.mean_len) == [20 * d + 10 for d in range(10)]


def test_length_bias_corr_matches_python(spark):
    import duckdb
    import hashlib
    import math

    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    xs, ys = [], []
    for did, nc in rows:
        xs.append(nc)
        ys.append(int(hashlib.md5(f"rlb:{did}".encode())
                      .hexdigest()[:4], 16))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    corr = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    out = REGISTRY["eval_reward_length_bias"].spark(spark, SF_DIR).toPandas()
    assert abs(out["corr"].iloc[0] - corr) < 2e-6


# --------------------------------------------------------------------------
# fn_useragent_parse
# --------------------------------------------------------------------------


def test_useragent_segments_and_rule_order(spark):
    out = (
        REGISTRY["fn_useragent_parse"].spark(spark, SF_DIR).toPandas()
        .set_index(["browser", "os"])
    )
    # exactly the four planted segments — in particular NO
    # ('safari', 'windows') row: Chrome UAs say Safari too, and the
    # rule order must keep them out of the safari bucket
    assert set(out.index) == {
        ("chrome", "windows"), ("safari", "ios"),
        ("firefox", "linux"), ("googlebot", "other"),
    }
    assert bool(out.loc[("googlebot", "other"), "is_bot"])
    assert not bool(out.loc[("chrome", "windows"), "is_bot"])
    # version ranges match the construction: chrome keys are ==0 mod 4,
    # so k % 30 only hits the 15 EVEN residues -> 100..128
    assert out.loc[("chrome", "windows"), "min_major"] == 100
    assert out.loc[("chrome", "windows"), "max_major"] == 128
    assert out.loc[("chrome", "windows"), "n_versions"] == 15
    assert out.loc[("firefox", "linux"), "min_major"] == 110
    assert out.loc[("firefox", "linux"), "max_major"] == 124
    # Safari major comes from Version/17 -> constant 17
    assert out.loc[("safari", "ios"), "min_major"] == 17
    assert out.loc[("safari", "ios"), "max_major"] == 17
    # Googlebot/2.1 -> major 2
    assert out.loc[("googlebot", "other"), "min_major"] == 2


def test_useragent_single_row_parse(spark, tmp_path):
    rows = [
        (4, 1, "O", 1.0, datetime.datetime(2024, 1, 1), "1-A"),  # m=0
        (7, 1, "O", 1.0, datetime.datetime(2024, 1, 1), "1-A"),  # m=3
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = (
        REGISTRY["fn_useragent_parse"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("browser")
    )
    # key 4: Chrome/(100 + 4%30=4) = 104 on windows; key 7: Googlebot
    assert out.loc["chrome", "min_major"] == 104
    assert out.loc["chrome", "os"] == "windows"
    assert bool(out.loc["googlebot", "is_bot"])
