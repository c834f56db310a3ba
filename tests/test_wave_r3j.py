"""Semantic laws for the r3j wave: Gopher rule battery and power
iteration."""

from __future__ import annotations

import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _floorround(x: float, n: int) -> float:
    return math.floor(x * 10**n + 0.5) / 10**n


# ---------------------------------------------------------------- gopher

def test_gopher_each_rule_catches_its_violation(spark, tmp_path):
    good = "the quick brown fox jumps over a lazy dog " * 3  # 27 words
    docs = [
        (1, good.strip(), "en", "s", len(good)),
        (2, "the a short", "en", "s", 11),                      # R1: 3 words
        (3, ("the a " + "x " * 30).strip(), "en", "s", 66),     # R2: mean<3
        (4, ("word " * 25).strip(), "en", "s", 125),            # R3: no stopwords
        (5, ("the a " + "123 " * 30).strip(), "en", "s", 126),  # R4: digits
    ]
    _write_docs(spark, tmp_path, docs)
    out = {
        r.doc_id: r
        for r in REGISTRY["quality_gopher_rules"].spark(spark, str(tmp_path)).collect()
    }
    assert out[1].pass_all
    assert not out[2].r1_word_count and not out[2].pass_all
    assert not out[3].r2_mean_word_len and out[3].r1_word_count
    assert not out[4].r3_stopwords and out[4].r1_word_count
    assert not out[5].r4_alpha_fraction and out[5].r3_stopwords


def test_gopher_fixture_consistency(spark):
    out = REGISTRY["quality_gopher_rules"].spark(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(out) == n_docs
    for r in out:
        assert r.pass_all == (
            r.r1_word_count and r.r2_mean_word_len
            and r.r3_stopwords and r.r4_alpha_fraction
        )
        # all-lowercase-alpha synthetic corpus: alpha rule always holds
        assert r.n_alpha == r.n_words and r.r4_alpha_fraction
    assert any(r.pass_all for r in out)
    assert any(not r.pass_all for r in out)  # short docs exist (min 10 words)


# --------------------------------------------------------- power iteration

def test_power_iteration_unit_norm_and_psd(spark):
    out = REGISTRY["embedding_power_iteration"].spark(spark, SF_DIR).collect()
    assert len(out) == 64
    norm2 = sum(r.eigvec ** 2 for r in out)
    assert abs(norm2 - 1.0) <= 1e-4  # unit vector (rounded components)
    lams = {r.lambda_est for r in out}
    assert len(lams) == 1  # one Rayleigh quotient repeated
    assert lams.pop() > 0  # Gram matrices are PSD; fixture is nonzero


def test_power_iteration_rank_one_exact(spark, tmp_path):
    # three identical vectors -> G = 3 q qT; the top eigvec is q/|q| and
    # lambda = 3|q|^2 after a single iteration (rank-1 fixed point)
    v = [0.5, 0.5] + [0.0] * 62
    spark.createDataFrame(
        [(i, v, 0) for i in range(3)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {r.i: r for r in
           REGISTRY["embedding_power_iteration"].spark(spark, str(tmp_path)).collect()}
    c = _floorround(1 / math.sqrt(2), 6)
    assert out[1].eigvec == c and out[2].eigvec == c
    assert all(out[i].eigvec == 0.0 for i in range(3, 65))
    # lambda = 3 * (0.5^2 + 0.5^2) quantized to milli-units = 1.5
    assert out[1].lambda_est == 1.5
