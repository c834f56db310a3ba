"""Semantic laws for the r5l wave: power planner + prefix-dim eval."""

from __future__ import annotations

import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

ZZ = 1.959964 + 0.841621


def test_power_mde_monotone_and_recompute(spark):
    out = (
        REGISTRY["ab_power_mde"].spark(spark, SF_DIR).toPandas()
        .sort_values("frac")
        .reset_index(drop=True)
    )
    assert list(out.frac) == [0.01, 0.02, 0.05, 0.10]
    # bigger target effect -> fewer users needed (strictly, ~1/frac^2)
    assert (out.required_n_per_arm.diff().dropna() < 0).all()
    # quadratic law: halving the effect ~quadruples the requirement
    r = out.set_index("frac").required_n_per_arm
    assert 3.5 < r[0.01] / r[0.02] < 4.5
    assert 3.5 < r[0.05] / r[0.10] < 4.5
    # is_powered consistent with the two columns it compares
    assert (
        (out.required_n_per_arm <= out.n_have_per_arm)
        == (out.is_powered == 1)
    ).all()
    # current-sample MDE is a single constant across rows
    assert out.mde_now_cents.nunique() == 1
    assert out.mde_now_cents.iloc[0] > 0


def test_power_mde_planted_variance(spark, tmp_path):
    import datetime
    import hashlib

    # two arms, equal constant spend except one deviator per arm at a
    # known offset -> hand-computable variance and requirement
    rows = []
    for u in range(400):
        v = 100.0
        if u in (0, 1):
            v = 120.0
        rows.append(
            (u, u, "purchase", datetime.datetime(2024, 3, 20, 9, 0), v, "s")
        )
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE, session_id STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = REGISTRY["ab_power_mde"].spark(spark, str(tmp_path)).toPandas()
    # recompute pooled variance in python over the same integer cents
    ys = {}
    for u in range(400):
        arm = hashlib.md5(f"arm:{u}".encode()).hexdigest()[0] < "8"
        ys.setdefault(arm, []).append(12000 if u in (0, 1) else 10000)
    ss = sum(
        sum((y - sum(v) / len(v)) ** 2 for y in v) for v in ys.values()
    )
    var_p = ss / (len(ys[True]) + len(ys[False]) - 2)
    mean_b = sum(ys[False]) / len(ys[False])
    for _, r in out.iterrows():
        delta = r.frac * mean_b
        req = math.ceil(2 * var_p * ZZ * ZZ / (delta * delta))
        assert abs(r.required_n_per_arm - req) <= 1


def test_prefix_dims_eval_monotone(spark):
    out = (
        REGISTRY["embedding_prefix_dims_eval"].spark(spark, SF_DIR).toPandas()
        .sort_values("prefix_dim")
        .reset_index(drop=True)
    )
    assert list(out.prefix_dim) == [16, 32]
    assert (out.n_queries == out.n_queries.iloc[0]).all()
    # a longer prefix can only track the full ranking better (on this
    # corpus; assert non-strict monotonicity)
    assert out.recall_at_10.iloc[1] >= out.recall_at_10.iloc[0] - 1e-9
    # identities: recall = hits / (10 * queries); bounds
    import math

    for _, r in out.iterrows():
        # half-up quantization, matching the engines (Python round()
        # banker's-rounds exact midpoints like 394/1280 the other way)
        want = math.floor(r.total_hits / (10 * r.n_queries) * 1e6 + 0.5) / 1e6
        assert abs(r.recall_at_10 - want) < 1e-9
        assert 0 <= r.worst_query_recall <= r.recall_at_10 + 1e-9


def test_prefix_dims_full_prefix_is_exact(spark, tmp_path):
    # if vectors carry all mass in the first 16 dims, the 16-prefix
    # ranking IS the full ranking -> recall 1.0
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(60):
        head = [rnd.uniform(-1, 1) for _ in range(16)]
        rows.append((i, head + [0.0] * 48, 0))
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = (
        REGISTRY["embedding_prefix_dims_eval"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("prefix_dim")
    )
    assert out.loc[16, "recall_at_10"] == 1.0
    assert out.loc[32, "recall_at_10"] == 1.0
    assert out.loc[16, "worst_query_recall"] == 1.0
