"""Hypothesis property tests for the SCD2 merge (SURVEY.md §5.2(3)):
arbitrary snapshot sequences must preserve the version invariants, and
the final open set must equal the last snapshot exactly."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.operators.scd2 import (
    OPEN_END,
    scd2_apply,
    scd2_init,
)

KEYS = ["emp_id"]
TRACKED = ["dept_id", "salary"]

# a snapshot: subset of keys 1..5 with small attribute values (collisions
# between loads are the interesting case)
snapshot_strategy = st.dictionaries(
    keys=st.integers(min_value=1, max_value=5),
    values=st.tuples(
        st.integers(min_value=10, max_value=12),
        st.sampled_from([100.0, 200.0, None]),
    ),
    min_size=1,
    max_size=5,
)


def _to_df(spark, snap: dict):
    rows = [(k, d, s) for k, (d, s) in sorted(snap.items())]
    return spark.createDataFrame(rows, "emp_id long, dept_id long, salary double")


def _invariants(rows):
    per_key = {}
    for r in rows:
        per_key.setdefault(r.emp_id, []).append(r)
    for key, versions in per_key.items():
        opens = [v for v in versions if v.is_current]
        assert len(opens) <= 1, f"key {key}: multiple open versions"
        for o in opens:
            assert o.effective_to == OPEN_END
        versions.sort(key=lambda v: v.effective_from)
        for a, b in zip(versions, versions[1:]):
            # non-overlap is the invariant; a strict gap is legitimate —
            # it means the key departed (closed) and later returned
            # (hypothesis found this case: load, drop, reload)
            assert a.effective_to <= b.effective_from, f"key {key}: overlap"
        assert all(v.effective_from < v.effective_to for v in versions), (
            f"key {key}: zero-length version"
        )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(snaps=st.lists(snapshot_strategy, min_size=1, max_size=4))
def test_arbitrary_load_sequences_preserve_invariants(spark, snaps):
    d0 = dt.date(2024, 1, 1)
    dim = scd2_init(_to_df(spark, snaps[0]), KEYS, TRACKED, d0)
    for i, snap in enumerate(snaps[1:], start=1):
        dim = scd2_apply(
            dim, _to_df(spark, snap), KEYS, TRACKED,
            d0 + dt.timedelta(days=30 * i), close_missing=True,
        )
    rows = dim.collect()
    _invariants(rows)
    # the open set must equal the final snapshot exactly
    final = snaps[-1]
    open_rows = {r.emp_id: (r.dept_id, r.salary) for r in rows if r.is_current}
    assert open_rows == {k: v for k, v in final.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(snap=snapshot_strategy)
def test_reapply_is_always_noop(spark, snap):
    d1, d2, d3 = dt.date(2024, 1, 1), dt.date(2024, 2, 1), dt.date(2024, 3, 1)
    df = _to_df(spark, snap)
    dim = scd2_init(df, KEYS, TRACKED, d1)
    once = scd2_apply(dim, df, KEYS, TRACKED, d2, close_missing=True)
    twice = scd2_apply(once, df, KEYS, TRACKED, d3, close_missing=True)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
