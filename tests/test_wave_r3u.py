"""Semantic laws for the r3u wave: interval union coverage and
sequence-pattern detection."""

from __future__ import annotations

import datetime as dt

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


# ------------------------------------------------------ interval union

def test_interval_union_swallow_case(spark, tmp_path):
    # a long signup interval [0,1800] swallows two later view intervals
    # that a prev-ROW formulation would wrongly break apart
    _write_events(spark, tmp_path, [
        (1, _ts(0), 1, "signup", 1.0, "{}"),     # [0, 1800]
        (2, _ts(60), 1, "view", 1.0, "{}"),      # [60, 360]   inside
        (3, _ts(600), 1, "view", 1.0, "{}"),     # [600, 900]  inside,
                                                  # prev-row end was 360
        (4, _ts(2000), 1, "view", 1.0, "{}"),    # [2000, 2300] separate
    ])
    out = REGISTRY["interval_union_coverage"].spark(spark, str(tmp_path)).collect()
    r = out[0]
    assert (r.user_id, r.n_intervals) == (1, 2)
    assert r.covered_us == (1800 + 300) * 1_000_000
    assert r.longest_us == 1800 * 1_000_000


def test_interval_union_touching_merges(spark, tmp_path):
    _write_events(spark, tmp_path, [
        (1, _ts(0), 1, "view", 1.0, "{}"),       # [0, 300]
        (2, _ts(300), 1, "view", 1.0, "{}"),     # [300, 600] touches
    ])
    r = REGISTRY["interval_union_coverage"].spark(spark, str(tmp_path)).collect()[0]
    assert (r.n_intervals, r.covered_us) == (1, 600 * 1_000_000)


def test_interval_union_fixture_laws(spark):
    out = REGISTRY["interval_union_coverage"].spark(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    per_user = {r[0]: r[1] for r in
                ev.groupBy("user_id").count().collect()}
    assert len(out) == len(per_user)
    for r in out:
        n = per_user[r.user_id]
        assert 1 <= r.n_intervals <= n
        assert r.longest_us <= r.covered_us <= n * 1_800_000_000
        assert r.covered_us >= 300_000_000  # at least one base interval


# ------------------------------------------------------ sequence regex

def test_seq_patterns_constructed(spark, tmp_path):
    rows = [
        # user 1: V,C,P adjacent -> direct conversion
        (1, _ts(0), 1, "view", 1.0, "{}"),
        (2, _ts(1), 1, "click", 1.0, "{}"),
        (3, _ts(2), 1, "purchase", 1.0, "{}"),
        # user 2: V,S,C,E,P -> assisted (noise-tolerant), not direct
        (4, _ts(0), 2, "view", 1.0, "{}"),
        (5, _ts(1), 2, "signup", 1.0, "{}"),
        (6, _ts(2), 2, "click", 1.0, "{}"),
        (7, _ts(3), 2, "error", 1.0, "{}"),
        (8, _ts(4), 2, "purchase", 1.0, "{}"),
        # user 3: P then V -> abandoned tail, no conversion path
        (9, _ts(0), 3, "purchase", 1.0, "{}"),
        (10, _ts(1), 3, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r.user_id: r for r in
           REGISTRY["seq_pattern_regex"].spark(spark, str(tmp_path)).collect()}
    assert (out[1].seq_len, out[1].n_direct_vcp,
            out[1].has_assisted_path, out[1].ends_abandoned) == (3, 1, True, False)
    assert (out[2].seq_len, out[2].n_direct_vcp,
            out[2].has_assisted_path, out[2].ends_abandoned) == (5, 0, True, False)
    assert (out[3].seq_len, out[3].n_direct_vcp,
            out[3].has_assisted_path, out[3].ends_abandoned) == (2, 0, False, True)


def test_seq_patterns_fixture_laws(spark):
    out = REGISTRY["seq_pattern_regex"].spark(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    per_user = {r[0]: r[1] for r in ev.groupBy("user_id").count().collect()}
    assert len(out) == len(per_user)
    for r in out:
        assert r.seq_len == per_user[r.user_id]
        assert 0 <= r.n_direct_vcp <= r.seq_len // 3
        if r.n_direct_vcp > 0:
            assert r.has_assisted_path  # VCP is an assisted path too
