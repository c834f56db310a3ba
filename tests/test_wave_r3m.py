"""Semantic laws for the r3m wave: Benford gate and portable Soundex."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_benford_fixture_fails_as_designed(spark):
    out = REGISTRY["qc_benford_digits"].spark(spark, SF_DIR).collect()
    assert len(out) == 9
    assert [r.digit for r in out] == list(range(1, 10))
    assert abs(sum(r.share for r in out) - 1.0) <= 1e-4
    assert abs(sum(r.p_benford for r in out) - 1.0) <= 1e-5
    chi2s = {r.chi2 for r in out}
    assert len(chi2s) == 1
    # synthetic range-uniform totals are NOT Benford — the gate must say so
    assert not out[0].is_benford and chi2s.pop() > 20.09


def test_benford_synthetic_benford_sample_passes(spark, tmp_path):
    # construct totals whose first-digit census matches Benford closely:
    # n_d = round(1000 * p_d) copies of digit d
    import datetime as dt
    props = [301, 176, 125, 97, 79, 67, 58, 51, 46]
    rows = []
    oid = 0
    for d, n in zip(range(1, 10), props):
        for _ in range(n):
            rows.append((oid, 1, "O", float(d * 100), dt.datetime(2024, 1, 1), "1-URGENT"))
            oid += 1
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = REGISTRY["qc_benford_digits"].spark(spark, str(tmp_path)).collect()
    assert out[0].is_benford and out[0].chi2 < 1.0


def test_soundex_matches_spark_builtin_on_vocabulary(spark):
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    words = part.select(
        F.element_at(F.split("p_name", " "), 1).alias("word")
    ).distinct()
    # builtin vs the registered portable algorithm, word by word
    builtin = {r.word: r.sdx for r in
               words.select("word", F.soundex("word").alias("sdx")).collect()}
    out = REGISTRY["fn_soundex_portable"].spark(spark, SF_DIR).collect()
    portable = {}
    for r in out:
        for w in r.words.split(","):
            portable[w] = r.soundex
    assert set(portable) == set(builtin)
    diverging = {w for w in portable if portable[w] != builtin[w]}
    # the h/w separator simplification is the only permitted divergence:
    # every diverging word must contain h or w after position 1
    for w in diverging:
        assert any(c in "hw" for c in w[1:]), (w, portable[w], builtin[w])


def test_soundex_blocking_groups_known_homophones(spark, tmp_path):
    spark.createDataFrame(
        [(i, n, "B", "t", 1, 1.0) for i, n in
         enumerate(["robert thing", "rupert thing", "ashcraft thing"])],
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    out = {r.soundex: r for r in
           REGISTRY["fn_soundex_portable"].spark(spark, str(tmp_path)).collect()}
    # classic pair: robert and rupert share R163
    assert out["R163"].words == "robert,rupert" and out["R163"].n_words == 2
