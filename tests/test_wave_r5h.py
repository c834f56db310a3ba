"""Semantic laws for the r5h wave: equi-depth histogram + combined
contamination report."""

from __future__ import annotations

import duckdb

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# histogram_equidepth
# --------------------------------------------------------------------------


def test_equidepth_bins_uniform_and_ordered(spark):
    out = (
        REGISTRY["histogram_equidepth"].spark(spark, SF_DIR).toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert list(out.bin) == list(range(10))
    # equal population up to 1 row
    assert out.n_rows.max() - out.n_rows.min() <= 1
    # boundaries tile the axis
    for i in range(1, len(out)):
        assert out.lo_cents[i] >= out.hi_cents[i - 1]
    # ndv bounded by population and positive
    assert ((out.ndv >= 1) & (out.ndv <= out.n_rows)).all()
    assert abs(out.cum_frac.iloc[-1] - 1.0) < 1e-6
    # population reconciles with the source
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    assert int(out.n_rows.sum()) == n


def test_equidepth_vs_equiwidth_on_skew(spark):
    # on the skewed totalprice column, equi-depth boundaries are
    # monotone-increasing in width toward the tail (coarser where data
    # is sparse) — the property equi-width lacks
    out = REGISTRY["histogram_equidepth"].spark(spark, SF_DIR).toPandas()
    widths = out.hi_cents - out.lo_cents
    assert widths.iloc[-1] > widths.iloc[0]


# --------------------------------------------------------------------------
# decontaminate_report
# --------------------------------------------------------------------------


def test_report_consistent_with_parents(spark):
    rep = (
        REGISTRY["decontaminate_report"].spark(spark, SF_DIR).toPandas()
        .set_index("doc_id")
    )
    ngram = (
        REGISTRY["decontaminate"].spark(spark, SF_DIR).toPandas()
        .set_index("doc_id")
    )
    # overlap ratios agree with the parent n-gram key on shared docs
    common = rep.index.intersection(ngram.index)
    assert len(common) > 0
    assert (
        (rep.loc[common, "overlap_ratio"] - ngram.loc[common, "overlap_ratio"])
        .abs()
        .max()
        < 1e-9
    )
    # verdict algebra
    for _, r in rep.iterrows():
        expect = (
            "both"
            if r.ngram_flag and r.semantic_flag
            else "ngram"
            if r.ngram_flag
            else "semantic"
            if r.semantic_flag
            else "clean"
        )
        assert r.verdict == expect
    # eval docs never appear as train rows
    src0 = set(
        duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' "
            f"WHERE source = 'src0'"
        ).df()["doc_id"]
    )
    assert not (set(rep.index) & src0)


def test_report_flags_planted_verbatim_copy(spark, tmp_path):
    # a train doc that verbatim-copies an eval doc must flag 'ngram'
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, eval_text, "en", "src0", len(eval_text)),
        (1, eval_text, "en", "src1", len(eval_text)),  # verbatim leak
        (2, "totally unrelated words here about other things entirely",
         "en", "src2", 55),
    ]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    base = [1.0] * 32 + [0.0] * 32
    orth = [0.0] * 32 + [1.0] * 32
    spark.createDataFrame(
        [(0, base, 0), (1, base, 0), (2, orth, 0)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = (
        REGISTRY["decontaminate_report"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    # doc 1: verbatim text AND identical embedding -> 'both'
    assert out.loc[1, "overlap_ratio"] == 1.0
    assert out.loc[1, "verdict"] == "both"
    # doc 2: clean on both axes
    assert out.loc[2, "overlap_ratio"] == 0.0
    assert out.loc[2, "verdict"] == "clean"
