"""Mutation checks for the differential harness itself.

The 272 oracle comparisons are only as good as ``assert_frames_match``
— if the canonicalizer ever started sorting away real differences (or
a dtype coercion started masking value drift), every differential test
would pass vacuously. These tests inject known mutations into real
query outputs and assert the comparator REJECTS them.
"""

from __future__ import annotations

import duckdb
import pytest

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.compare import assert_frames_match
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def frames(spark):
    """One representative (spark, oracle) result pair."""
    spec = REGISTRY["agg_grouped"]
    got = spec.spark(spark, SF_DIR).toPandas()
    duck = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    want = duck.execute(spec.oracle).df()
    return got, want


def test_clean_pair_matches(frames):
    got, want = frames
    assert_frames_match(got.copy(), want.copy(), name="clean")


def test_detects_value_drift(frames):
    got, want = frames
    mutated = got.copy()
    num_cols = [c for c in mutated.columns if mutated[c].dtype.kind in "if"]
    mutated.loc[mutated.index[0], num_cols[0]] += 1
    with pytest.raises(AssertionError):
        assert_frames_match(mutated, want, name="value-drift")


def test_detects_dropped_row(frames):
    got, want = frames
    with pytest.raises(AssertionError):
        assert_frames_match(got.iloc[1:].copy(), want, name="dropped-row")


def test_detects_duplicated_row(frames):
    import pandas as pd

    got, want = frames
    dup = pd.concat([got, got.iloc[[0]]], ignore_index=True)
    with pytest.raises(AssertionError):
        assert_frames_match(dup, want, name="dup-row")


def test_detects_renamed_column(frames):
    got, want = frames
    mutated = got.rename(columns={got.columns[0]: "wrong_name"})
    with pytest.raises(AssertionError):
        assert_frames_match(mutated, want, name="renamed-col")


def test_detects_swapped_values_across_rows(frames):
    """Row order must not matter, but swapping a value BETWEEN rows
    (breaking row integrity while preserving per-column multisets in
    one column only) must still fail via the other columns."""
    got, want = frames
    mutated = got.copy()
    if len(mutated) >= 2:
        c = [c for c in mutated.columns if mutated[c].dtype.kind in "if"][0]
        i0, i1 = mutated.index[0], mutated.index[1]
        v0, v1 = mutated.loc[i0, c], mutated.loc[i1, c]
        if v0 != v1:
            mutated.loc[i0, c], mutated.loc[i1, c] = v1, v0
            with pytest.raises(AssertionError):
                assert_frames_match(mutated, want, name="swapped")


def test_row_order_is_ignored(frames):
    """The one permutation that must NOT fail: shuffling whole rows."""
    got, want = frames
    shuffled = got.iloc[::-1].reset_index(drop=True)
    assert_frames_match(shuffled, want, name="row-order")
