"""Semantic invariants + plan-shape checks for the stats/time-series/
graph coverage wave (plans/stats.py, plans/timeseries.py,
plans/graph.py, plans/corpus_stats.py). Value-level correctness vs
DuckDB is covered by tests/test_differential.py; these tests pin the
properties the oracle can't express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR
from tests.test_plans_physical import plan_of


def test_pagerank_mass_conserved(spark):
    """With no dangling-mass loss (every nation has out-edges), total
    rank must stay ~1 after every iteration."""
    rows = REGISTRY["graph_pagerank"].spark(spark, SF_DIR).collect()
    assert len(rows) == 25
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-3, total
    assert all(r["rank"] > 0 for r in rows)


def test_pagerank_iterations_never_shuffle_fact_tables(spark):
    """The fact join happens once (before localCheckpoint); the returned
    plan must reference only the checkpointed edge RDD — re-scanning
    lineitem per iteration would be the 100 TB failure mode."""
    plan = plan_of(spark, "graph_pagerank")
    assert "lineitem" not in plan and "orders" not in plan, plan[:800]
    assert "ExistingRDD" in plan  # edges come from the checkpoint
    assert "BroadcastHashJoin" in plan  # 25-row rank vector stays broadcast
    assert "SortMergeJoin" not in plan  # nothing in the loop is big enough


def test_funnel_stages_monotone(spark):
    r = REGISTRY["funnel_conversion"].spark(spark, SF_DIR).collect()[0]
    assert r["n_users"] >= r["n_viewed"] >= r["n_clicked_2h"] >= r["n_purchased_24h"]
    assert r["n_purchased_24h"] >= 0


def test_gapfill_spine_is_dense(spark):
    """Every (type, hour) cell in [min,max] exists exactly once; filled
    hours carry the forward-filled level of the latest observed hour."""
    df = REGISTRY["ts_gapfill"].spark(spark, SF_DIR)
    per_type = df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count_distinct("hour").alias("n_hours"),
        F.min("hour").alias("lo"),
        F.max("hour").alias("hi"),
    )
    for r in per_type.collect():
        span_hours = int((r["hi"] - r["lo"]).total_seconds() // 3600) + 1
        assert r["n"] == r["n_hours"] == span_hours, r
    # forward fill: once any hour is observed, value_sum_ff is non-null
    gaps = df.filter(F.col("n_events") == 0).count()
    assert gaps > 0, "gap-fill fixture has no gaps — spine check vacuous"


def test_ohlc_bounds(spark):
    df = REGISTRY["ts_resample_ohlc"].spark(spark, SF_DIR)
    bad = df.filter(
        (F.col("open") > F.col("high"))
        | (F.col("close") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") < F.col("low"))
        | (F.col("low") > F.col("high"))
    ).count()
    assert bad == 0


def test_entropy_bounds(spark):
    """0 ≤ H ≤ log2(distinct chars), with equality only for degenerate
    docs; uniform synthetic text should land strictly inside."""
    rows = REGISTRY["text_entropy"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy"] <= math.log2(r["n_distinct_chars"]) + 1e-9, r


def test_zscore_is_single_window_pass(spark):
    """Mean and stddev come from one Window exchange — a stats-table
    self-join formulation would double the scans."""
    plan = plan_of(spark, "anomaly_zscore")
    assert plan.count("Exchange") <= 2, plan[:1200]  # 1 window hash + AQE reads
    assert "Join" not in plan


def test_higher_order_fns_stay_codegen(spark):
    """Array lambdas must not fall back to python UDF evaluation."""
    plan = plan_of(spark, "fn_higher_order")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_readability_is_narrow(spark):
    plan = plan_of(spark, "text_readability")
    assert "Exchange" not in plan, plan[:800]


def test_hll_rollup_matches_exact_within_envelope(spark):
    """Union-of-daily-sketches estimate must sit inside the lgK=14
    error envelope (±2% at 3σ) of the exact per-type distinct count."""
    got = {
        r["event_type"]: r
        for r in REGISTRY["sketch_hll_rollup"].spark(spark, SF_DIR).collect()
    }
    from gcp_de_data_pipeline_cc_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, row in got.items():
        assert abs(row["est_users"] - exact[t]) <= max(2, 0.02 * exact[t]), (t, row)
        assert row["n_partials"] >= 28  # one partial per day of the month


def test_sessionize_topk_prunes_before_shuffle(spark):
    """The per-user first-3 filter must push a WindowGroupLimit below
    the exchange — shuffling the whole stream to rank it would be the
    scale bug."""
    plan = plan_of(spark, "sessionize_path")
    assert "WindowGroupLimit" in plan, plan[:1200]


def test_fk_gate_dimension_edges_broadcast(spark):
    plan = plan_of(spark, "qc_foreign_keys")
    assert "BroadcastHashJoin LeftAnti" in plan


def test_kmeans_assign_broadcasts_centroids(spark):
    plan = plan_of(spark, "kmeans_assign")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan  # scoring stays JVM-side


def test_sample_hash_group_limit(spark):
    plan = plan_of(spark, "sample_hash_topk")
    assert "WindowGroupLimit" in plan
