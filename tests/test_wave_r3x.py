"""Semantic laws for the r3x wave: LSH S-curve calibration."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_lsh_calibration_identical_docs_always_collide(spark, tmp_path):
    _write_docs(spark, tmp_path, [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta epsilon",   # J = 1 with doc 0
        "zeta eta theta iota kappa",        # J = 0 with both
    ])
    out = {r.j_bucket: r for r in
           REGISTRY["dedup_lsh_calibration"].spark(spark, str(tmp_path))
           .collect()}
    # only the identical pair shares shingles -> single bucket at J=1.0
    assert set(out) == {10}
    r = out[10]
    assert (r.n_pairs, r.n_collided) == (1, 1)
    assert r.measured_rate == 1.0 and r.predicted_rate == 1.0


def test_lsh_calibration_fixture_curve(spark):
    out = {r.j_bucket: r for r in
           REGISTRY["dedup_lsh_calibration"].spark(spark, SF_DIR).collect()}
    assert len(out) > 0
    for b, r in out.items():
        assert 0 <= r.n_collided <= r.n_pairs
        assert 0.0 <= r.measured_rate <= 1.0
        assert 0.0 <= r.predicted_rate <= 1.0
    # theory: prediction is monotone in the bucket index
    preds = [out[b].predicted_rate for b in sorted(out)]
    assert preds == sorted(preds)
    # exact duplicates always collide (identical signatures)
    if 10 in out:
        assert out[10].measured_rate == 1.0
    # the curve's floor: near-disjoint pairs should essentially never
    # become candidates (that's the shuffle-waste guarantee)
    if 0 in out:
        assert out[0].measured_rate <= 0.05
