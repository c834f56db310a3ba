"""Property tests for the SCD2 merge operator (SURVEY.md §5.2(3),
scenario from FIXTURES.md §B): version-range invariants, no-op
idempotence, same-day restatement, departures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.operators.scd2 import (
    OPEN_END,
    scd2_apply,
    scd2_init,
)

KEYS = ["emp_id"]
TRACKED = ["emp_name", "dept_id", "salary"]
D1 = dt.date(2024, 1, 1)
D2 = dt.date(2024, 2, 1)
D3 = dt.date(2024, 3, 1)


@pytest.fixture()
def day1(spark):
    return spark.createDataFrame(
        [(1, "alice", 10, 100.0), (2, "bob", 10, 200.0), (3, "carol", 20, 300.0)],
        "emp_id long, emp_name string, dept_id long, salary double",
    )


@pytest.fixture()
def day2(spark):
    # alice: salary change; bob: unchanged; carol: gone; dave: new hire
    return spark.createDataFrame(
        [(1, "alice", 10, 150.0), (2, "bob", 10, 200.0), (4, "dave", 20, 250.0)],
        "emp_id long, emp_name string, dept_id long, salary double",
    )


def _rows(df):
    return {
        (r.emp_id, r.effective_from, r.effective_to, r.is_current): r
        for r in df.collect()
    }


def _check_invariants(df):
    """At most one open version per key (zero = departed key closed via
    close_missing); ranges non-overlapping and gap-free."""
    per_key = {}
    for r in df.collect():
        per_key.setdefault(r.emp_id, []).append(r)
    for key, versions in per_key.items():
        opens = [v for v in versions if v.is_current]
        assert len(opens) <= 1, f"key {key}: {len(opens)} open versions"
        for o in opens:
            assert o.effective_to == OPEN_END
        versions.sort(key=lambda v: v.effective_from)
        for a, b in zip(versions, versions[1:]):
            assert a.effective_to == b.effective_from, f"key {key}: gap/overlap"


def test_init_all_open(spark, day1):
    dim = scd2_init(day1, KEYS, TRACKED, D1)
    rows = dim.collect()
    assert len(rows) == 3
    assert all(r.is_current and r.effective_to == OPEN_END for r in rows)
    _check_invariants(dim)


def test_apply_change_new_departure(spark, day1, day2):
    dim = scd2_init(day1, KEYS, TRACKED, D1)
    out = scd2_apply(dim, day2, KEYS, TRACKED, D2, close_missing=True)
    _check_invariants(out)
    rows = _rows(out)
    # alice: closed old + open new
    assert (1, D1, D2, False) in rows and (1, D2, OPEN_END, True) in rows
    assert rows[(1, D2, OPEN_END, True)].salary == 150.0
    # bob untouched
    assert (2, D1, OPEN_END, True) in rows
    # carol closed (departure, close_missing=True)
    assert (3, D1, D2, False) in rows
    # dave new
    assert (4, D2, OPEN_END, True) in rows
    assert out.count() == 5  # alice×2, bob, carol(closed), dave


def test_departure_stays_open_without_close_missing(spark, day1, day2):
    dim = scd2_init(day1, KEYS, TRACKED, D1)
    out = scd2_apply(dim, day2, KEYS, TRACKED, D2, close_missing=False)
    rows = _rows(out)
    assert (3, D1, OPEN_END, True) in rows


def test_reapply_same_snapshot_is_noop(spark, day1, day2):
    dim = scd2_init(day1, KEYS, TRACKED, D1)
    once = scd2_apply(dim, day2, KEYS, TRACKED, D2)
    twice = scd2_apply(once, day2, KEYS, TRACKED, D3)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_same_day_restatement_no_zero_length_version(spark, day1):
    dim = scd2_init(day1, KEYS, TRACKED, D1)
    restated = day1.withColumn(
        "salary", F.when(F.col("emp_id") == 1, 999.0).otherwise(F.col("salary"))
    )
    out = scd2_apply(dim, restated, KEYS, TRACKED, D1)
    _check_invariants(out)
    rows = _rows(out)
    # in-place replace: still one version for alice, starting D1, new salary
    assert rows[(1, D1, OPEN_END, True)].salary == 999.0
    assert out.filter(F.col("emp_id") == 1).count() == 1


def test_multi_generation_history(spark, day1, day2):
    dim = scd2_init(day1, KEYS, TRACKED, D1)
    dim = scd2_apply(dim, day2, KEYS, TRACKED, D2, close_missing=True)
    day3 = spark.createDataFrame(
        [(1, "alice", 30, 175.0), (2, "bob", 10, 200.0), (4, "dave", 20, 250.0)],
        "emp_id long, emp_name string, dept_id long, salary double",
    )
    dim = scd2_apply(dim, day3, KEYS, TRACKED, D3, close_missing=True)
    _check_invariants(dim)
    alice = sorted(
        dim.filter(F.col("emp_id") == 1).collect(),
        key=lambda r: r.effective_from,
    )
    assert [(r.effective_from, r.effective_to) for r in alice] == [
        (D1, D2), (D2, D3), (D3, OPEN_END),
    ]
    assert [r.salary for r in alice] == [100.0, 150.0, 175.0]


def test_same_day_departure_leaves_no_zero_length_version(spark, day1):
    """A key opened today and already absent from today's later load must
    vanish, not close as a zero-length [d, d) version."""
    dim = scd2_init(day1, KEYS, TRACKED, D1)
    without_carol = day1.filter(F.col("emp_id") != 3)
    out = scd2_apply(dim, without_carol, KEYS, TRACKED, D1, close_missing=True)
    _check_invariants(out)
    assert out.filter(F.col("emp_id") == 3).count() == 0
    assert out.filter(
        F.col("effective_from") == F.col("effective_to")
    ).count() == 0


def test_null_safe_change_detection(spark):
    a = spark.createDataFrame(
        [(1, None, 10, 100.0)],
        "emp_id long, emp_name string, dept_id long, salary double",
    )
    # null moved between columns must register as a change
    b = spark.createDataFrame(
        [(1, "10", None, 100.0)],
        "emp_id long, emp_name string, dept_id long, salary double",
    )
    dim = scd2_init(a, KEYS, TRACKED, D1)
    out = scd2_apply(dim, b, KEYS, TRACKED, D2)
    assert out.count() == 2  # closed + new, not silently equal
