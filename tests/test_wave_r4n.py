"""Semantic laws for the r4n wave: Cohen's kappa + bigram-LM scoring."""

from __future__ import annotations

import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_kappa_internally_consistent(spark):
    out = REGISTRY["eval_agreement_kappa"].spark(spark, SF_DIR).toPandas()
    # dense 3x3 grid, counts partition the corpus
    assert len(out) == 9
    n = out["n_docs"].iloc[0]
    assert out["n"].sum() == n
    # recompute po/pe/kappa from the reported confusion matrix
    po_num = out.loc[out["ann1"] == out["ann2"], "n"].sum()
    rows = out.groupby("ann1")["n"].sum()
    cols = out.groupby("ann2")["n"].sum()
    pe_num = sum(int(rows[k]) * int(cols[k]) for k in range(3))
    want_kappa = (int(po_num) * int(n) - pe_num) / (int(n) * int(n) - pe_num)
    assert abs(out["kappa"].iloc[0] - round(want_kappa, 6)) < 2e-6
    assert abs(out["po"].iloc[0] - round(po_num / n, 6)) < 2e-6
    # chance-corrected: kappa strictly below raw agreement, and the
    # planted flip rates (12.5% / 25%, overlap correction) leave
    # substantial-but-imperfect agreement
    assert out["kappa"].iloc[0] < out["po"].iloc[0]
    assert 0.3 < out["kappa"].iloc[0] < 0.95


def test_kappa_bounds_and_diagonal_dominance(spark):
    out = REGISTRY["eval_agreement_kappa"].spark(spark, SF_DIR).toPandas()
    assert -1.0 <= out["kappa"].iloc[0] <= 1.0
    # annotators share the latent label: each diagonal cell dominates
    # its row (errors are the minority by construction)
    for k in range(3):
        row = out[out["ann1"] == k]
        diag = row.loc[row["ann2"] == k, "n"].iloc[0]
        assert diag >= row["n"].max() * 0.5


def test_bigram_lm_shuffled_text_scores_worse(spark, tmp_path):
    """Common words in uncommon order: unigram-identical documents, but
    the bigram model must score the scrambled one strictly worse."""
    fluent = "the cat sat on the mat " * 20
    words = fluent.split()
    scrambled = " ".join(words[::2] + words[1::2])
    rows = [(1, fluent.strip(), "en", "a", len(fluent)),
            (2, scrambled, "en", "a", len(scrambled))] + [
        (i, "the cat sat on the mat", "en", "b", 22) for i in range(3, 40)
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["text_bigram_lm"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[2, "bits_per_bigram"] > out.loc[1, "bits_per_bigram"]
    assert out.loc[2, "perplexity"] > out.loc[1, "perplexity"]


def test_bigram_lm_output_laws(spark):
    out = REGISTRY["text_bigram_lm"].spark(spark, SF_DIR).toPandas()
    assert (out["n_bigrams"] >= 1).all()
    assert (out["bits_per_bigram"] > 0).all()
    # perplexity is exactly 2^bits of the rounded mean
    for r in out.head(50).itertuples():
        assert abs(r.perplexity - 2.0 ** r.bits_per_bigram) < 1e-9
