"""Semantic laws for the r4u wave: multi-class F1 report + corpus BLEU-2."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# eval_f1_multiclass
# --------------------------------------------------------------------------


def test_f1_counts_are_consistent(spark):
    out = (
        REGISTRY["eval_f1_multiclass"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("class_id")
    )
    assert sorted(out.index) == [0, 1, 2]
    # confusion bookkeeping: sum of tp+fn (row totals) = sum of tp+fp
    # (column totals) = N; micro_f1 == accuracy == sum(tp)/N
    n_total = int((out.tp + out.fn).sum())
    assert int((out.tp + out.fp).sum()) == n_total
    acc = out.tp.sum() / n_total
    assert abs(out.micro_f1.iloc[0] - acc) < 1e-6
    # macro is the unweighted mean of the per-class f1 columns
    assert abs(out.f1.mean() - out.macro_f1.iloc[0]) < 2e-6
    # every class sees both kinds of error under the two-sided channel
    assert (out.fp > 0).all() and (out.fn > 0).all()


def test_f1_recall_matches_channel_rate(spark):
    # the noise channel keeps ~71% (0x33+0x1a of 0x100 flipped);
    # per-class recall must sit near 1 - 77/256
    out = REGISTRY["eval_f1_multiclass"].spark(spark, SF_DIR).toPandas()
    keep = 1.0 - 77.0 / 256.0
    assert ((out.recall - keep).abs() < 0.06).all()
    # f1 identity vs the report's own counts
    for _, r in out.iterrows():
        f1 = 2 * r.tp / (2 * r.tp + r.fp + r.fn)
        assert abs(r.f1 - f1) < 1e-6


# --------------------------------------------------------------------------
# eval_bleu
# --------------------------------------------------------------------------


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_bleu_perfect_candidate_under_short_docs(spark, tmp_path):
    # docs with < 5 tokens never hit a replaced position -> candidate ==
    # reference -> p1 = p2 = bleu2 = 1 exactly
    _write_docs(spark, tmp_path, ["a b c d", "x y z", "p q r s"])
    out = REGISTRY["eval_bleu"].spark(spark, str(tmp_path)).toPandas().iloc[0]
    assert out.p1 == 1.0 and out.p2 == 1.0 and out.bleu2 == 1.0
    assert out.c_len == out.r_len == 11
    assert out.brevity_penalty == 1.0


def test_bleu_known_single_doc(spark, tmp_path):
    # 10 tokens, positions 5 and 10 replaced by 'qz' (absent from ref):
    # p1 = 8/10; bigrams: replaced positions break bigrams (4,5), (5,6),
    # (9,10) -> 6/9 survive and no 'qz' bigram matches ref
    _write_docs(spark, tmp_path, ["t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"])
    out = REGISTRY["eval_bleu"].spark(spark, str(tmp_path)).toPandas().iloc[0]
    assert out.p1_hits == 8 and out.p1_total == 10
    assert out.p2_hits == 6 and out.p2_total == 9
    expect = math.sqrt(0.8 * (6 / 9))
    assert abs(out.bleu2 - math.floor(expect * 1e6 + 0.5) / 1e6) < 1e-9


def test_bleu_clipping_caps_repeated_grams(spark, tmp_path):
    # candidate 'qz' tokens CAN match a reference that contains 'qz':
    # ref has one 'qz', candidate has two (pos 5,10 of 10) + clipping
    # caps credit at the reference count
    _write_docs(spark, tmp_path, ["qz t2 t3 t4 t5 t6 t7 t8 t9 t10"])
    out = REGISTRY["eval_bleu"].spark(spark, str(tmp_path)).toPandas().iloc[0]
    # positions 5,10 -> 'qz'; position 1 already 'qz' in ref and cand.
    # cand tokens: qz t2 t3 t4 qz t6 t7 t8 t9 qz -> three 'qz' vs ref ONE
    # -> clipped to 1; other 7 match -> hits = 8
    assert out.p1_hits == 8 and out.p1_total == 10


def test_bleu_sf_corpus_sane(spark):
    out = REGISTRY["eval_bleu"].spark(spark, SF_DIR).toPandas().iloc[0]
    # ~1/5 of tokens replaced: p1 in a band around 0.8
    assert 0.7 < out.p1 < 0.9
    # bigram precision strictly below unigram (each replacement breaks
    # two bigrams) and bleu2 is their geometric mean
    assert out.p2 < out.p1
    assert abs(out.bleu2 - math.sqrt(out.p1 * out.p2)) < 1e-5
    assert out.c_len == out.r_len
