"""Semantic laws for the r3l wave: BPE merge training."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_bpe_hand_computed_merges(spark, tmp_path):
    # classic Sennrich toy corpus: low x2, lower, lowest, new, newer
    _write_docs(spark, tmp_path,
                [(1, "low low lower lowest new newer", "en", "s", 30)])
    out = REGISTRY["tokenizer_bpe_train"].spark(spark, str(tmp_path)).collect()
    by = {(r.iteration, r.rnk): r for r in out}
    # iteration 1 pair census: l+o 4, o+w 4, e+r 2, n+e 2, w+e 2, ...
    # argmax ties l+o / o+w at 4 -> lexicographic picks l+o
    assert by[(1, 1)].pair == "l+o" and by[(1, 1)].pair_count == 4
    # after merging l->lo: lo+w has count 4 and wins iteration 2
    assert by[(2, 1)].pair == "lo+w" and by[(2, 1)].pair_count == 4


def test_bpe_adjacent_run_two_pass_merge(spark, tmp_path):
    # 'abab' -> a+b count 2 (pairs a+b, b+a, a+b); two-pass replace
    # must merge BOTH occurrences: ' ab ab ' -> iteration-2 top pair
    # is ab+ab with count 1
    _write_docs(spark, tmp_path, [(1, "abab", "en", "s", 4)])
    out = {(r.iteration, r.rnk): r for r in
           REGISTRY["tokenizer_bpe_train"].spark(spark, str(tmp_path)).collect()}
    assert out[(1, 1)].pair == "a+b" and out[(1, 1)].pair_count == 2
    assert out[(2, 1)].pair == "ab+ab" and out[(2, 1)].pair_count == 1


def test_bpe_fixture_shape_and_monotonicity(spark):
    out = REGISTRY["tokenizer_bpe_train"].spark(spark, SF_DIR).collect()
    assert len(out) == 6
    for it in (1, 2):
        ranks = [r.rnk for r in out if r.iteration == it]
        counts = [r.pair_count for r in out if r.iteration == it]
        assert ranks == [1, 2, 3]
        assert counts == sorted(counts, reverse=True)
    best1 = next(r for r in out if (r.iteration, r.rnk) == (1, 1))
    best2 = next(r for r in out if (r.iteration, r.rnk) == (2, 1))
    # the merged symbol may recombine, but the exact same pair can't win twice
    assert best1.pair != best2.pair
