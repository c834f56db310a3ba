"""Semantic invariants for the round-2 continuation waves (training
curation, tolerance-asof, interpolation, windowed distinct, PII).
Value-level correctness vs DuckDB is covered by tests/test_differential;
these pin the properties the oracle restates rather than independently
checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_decontaminate_ratio_bounds_and_no_eval_docs(spark):
    """Overlap ratio ∈ [0, 1]; n_overlap ≤ n_shingles; no eval-set
    (src0) document may appear on the train side."""
    rows = REGISTRY["decontaminate"].spark(spark, SF_DIR).collect()
    assert rows
    src0_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    for r in rows:
        assert 0 <= r.n_overlap <= r.n_shingles, r
        assert 0.0 <= r.overlap_ratio <= 1.0, r
        assert r.doc_id not in src0_ids, r


def test_repetition_ratios_consistent(spark):
    """top_count ≤ n_bigrams; distinct ≤ total; ratios in (0, 1]."""
    for r in REGISTRY["text_repetition"].spark(spark, SF_DIR).collect():
        assert 1 <= r.top_count <= r.n_bigrams
        assert 1 <= r.n_distinct <= r.n_bigrams
        assert 0.0 < r.repetition_ratio <= 1.0
        assert 0.0 < r.distinct_ratio <= 1.0


def test_mix_weights_normalized(spark):
    """Token shares and smoothed mix weights each sum to ~1; smoothing
    must pull weights toward uniform (small sources up, large down)."""
    rows = REGISTRY["corpus_mix_weights"].spark(spark, SF_DIR).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    if smallest.n_tokens < largest.n_tokens:
        assert smallest.mix_weight >= smallest.token_share
        assert largest.mix_weight <= largest.token_share


def test_asof_tolerance_subset_of_plain_asof(spark):
    """Every tolerance match must be ≤ the bound; and nulling is only
    ever due to no-prior-ref or staleness (cross-check against a direct
    per-user computation on the driver for the small fixture)."""
    rows = REGISTRY["join_asof_tolerance"].spark(spark, SF_DIR).collect()
    assert rows
    tol = 30 * 60 * 1_000_000
    for r in rows:
        if r.ref_id is not None:
            assert r.gap_us is not None and 0 <= r.gap_us <= tol, r
        else:
            assert r.gap_us is None, r


def test_interpolate_observed_points_exact_and_bounded(spark):
    """Observed hours keep their (rounded) value; interpolated values at
    interior gaps lie between the neighboring observations."""
    out = REGISTRY["ts_interpolate"].spark(spark, SF_DIR)
    rows = sorted(
        out.collect(), key=lambda r: (r.event_type, r.hour)
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        observed = [r for r in series if r.observed]
        assert observed, "every type has at least one observation"
        for i, r in enumerate(series):
            if r.observed or r.v_interp is None:
                continue
            prev_obs = next(
                (s for s in reversed(series[:i]) if s.observed), None
            )
            next_obs = next((s for s in series[i + 1:] if s.observed), None)
            if prev_obs and next_obs:
                lo = min(prev_obs.v_interp, next_obs.v_interp)
                hi = max(prev_obs.v_interp, next_obs.v_interp)
                assert lo - 1e-4 <= r.v_interp <= hi + 1e-4, (
                    r.event_type, r.hour, r.v_interp, lo, hi
                )


def test_windowed_distinct_monotone_and_bounded(spark):
    """Per user, the running distinct count is non-decreasing over time
    and never exceeds the user's total distinct types."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    totals = {
        r.user_id: r.n
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    rows = REGISTRY["win_count_distinct"].spark(spark, SF_DIR).collect()
    seen: dict[int, int] = {}
    # rows come back unordered; sort by the running count per user and
    # verify the max matches the total distinct
    for r in rows:
        seen[r.user_id] = max(
            seen.get(r.user_id, 0), r.n_distinct_types_so_far
        )
        assert 1 <= r.n_distinct_types_so_far <= totals[r.user_id]
    assert seen == totals


def test_mask_preserves_shape_destroys_content(spark):
    """Masked output has identical length and non-alphanumeric chars,
    with every letter/digit replaced by its class character."""
    rows = (
        REGISTRY["fn_mask"].spark(spark, SF_DIR).limit(20).collect()
    )
    src = {
        r.c_custkey: r.c_name
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name")
        .collect()
    }
    for r in rows:
        orig = src[r.c_custkey]
        assert len(r.masked_default) == len(orig)
        for o, m in zip(orig, r.masked_default):
            if o.isupper():
                assert m == "X"
            elif o.islower():
                assert m == "x"
            elif o.isdigit():
                assert m == "n"
            else:
                assert m == o


def test_crypto_roundtrip_inverts(spark):
    rows = REGISTRY["fn_crypto_roundtrip"].spark(spark, SF_DIR).collect()
    assert rows and all(r.roundtrip_ok for r in rows)


def test_bitmap_distinct_equals_plain_distinct(spark):
    got = {
        r.event_type: r.n_distinct_users
        for r in REGISTRY["agg_bitmap_distinct"].spark(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_asof_forward_matches_minimal_following(spark):
    """join_asof_forward: every matched purchase must be the user's
    earliest purchase at-or-after the signup (cross-checked directly on
    the small fixture); unmatched signups have no later purchase."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purchases: dict[int, list] = {}
    for r in ev:
        if r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append((r.ts, r.event_id))
    for v in purchases.values():
        v.sort()
    rows = REGISTRY["join_asof_forward"].spark(spark, SF_DIR).collect()
    assert rows
    signup_ts = {
        r.event_id: r.ts for r in ev if r.event_type == "signup"
    }
    for r in rows:
        s_ts = signup_ts[r.probe_id]
        later = [
            (ts, eid)
            for ts, eid in purchases.get(r.user_id, [])
            if ts >= s_ts
        ]
        if r.next_purchase_id is None:
            assert not later, r
        else:
            assert later and later[0][1] == r.next_purchase_id, r
            assert r.wait_us >= 0


def test_islands_partition_order_counts(spark):
    """win_islands: per customer, run lengths must sum to the customer's
    order count and run_idx must be contiguous 1..n_runs."""
    from pyspark.sql import functions as F2

    ev = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    totals = {
        r.o_custkey: r.n
        for r in ev.groupBy("o_custkey").agg(F2.count("*").alias("n")).collect()
    }
    rows = REGISTRY["win_islands"].spark(spark, SF_DIR).collect()
    per_cust: dict[int, list] = {}
    for r in rows:
        per_cust.setdefault(r.o_custkey, []).append(r)
    assert set(per_cust) == set(totals)
    for cust, runs in per_cust.items():
        assert sum(r.run_length for r in runs) == totals[cust]
        assert sorted(r.run_idx for r in runs) == list(
            range(1, len(runs) + 1)
        )
