"""SCD1 upsert unit tests: MERGE UPDATE SET * semantics (whole update
row wins including its nulls), inserts, unmatched-target survival."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.operators.merge import scd1_upsert


def test_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    out = {r.k: (r.name, r.v) for r in scd1_upsert(target, updates, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_null_in_update_wins(spark):
    """UPDATE SET * semantics: an update row's null replaces the target
    value (unlike per-column coalesce)."""
    target = spark.createDataFrame([(1, "a", 10.0)], "k long, name string, v double")
    updates = spark.createDataFrame([(1, None, 99.0)], "k long, name string, v double")
    row = scd1_upsert(target, updates, ["k"]).collect()[0]
    assert row.name is None and row.v == 99.0


def test_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a", 10.0)], "k long, name string, v double")
    updates = spark.createDataFrame([(1, "A", 11.0)], "k long, name string, v double")
    once = scd1_upsert(target, updates, ["k"])
    twice = scd1_upsert(once, updates, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
