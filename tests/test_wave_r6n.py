"""Semantic laws for the r6n wave: sign-bit Hamming search and the
slot-sizing sweep."""

from __future__ import annotations

import numpy as np

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# sim_topk_binary
# ---------------------------------------------------------------------------

def test_binary_fixture_recall_contract(spark):
    out = REGISTRY["sim_topk_binary"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 64  # the fixed-Q query sample
    assert (out.k == 10).all() and (out.n_exact == 10).all()
    assert (out.recall >= 0).all() and (out.recall <= 1).all()
    assert (out.n_hit <= out.n_exact).all()
    # 1-bit codes lose magnitude but must beat chance on clustered data
    assert out.recall.mean() > 0.02


def test_binary_planted_orthant_clusters_recall_one(spark, tmp_path):
    """Clusters that live in distinct sign orthants with 11 members
    each: the binary top-10 and the exact top-10 are both exactly the
    10 cluster-mates, so recall is 1.0 for every query."""
    rng = np.random.default_rng(11)
    dim = 64
    rows = []
    vid = 0
    for c in range(4):
        base = np.where(rng.normal(size=dim) > 0, 1.0, -1.0) * (c + 1)
        for _ in range(11):
            v = base + rng.normal(0, 0.01, dim)  # never flips a sign
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = REGISTRY["sim_topk_binary"].spark(spark, str(tmp_path)).toPandas()
    assert len(out) == 44  # Q=64 caps above the corpus size
    assert (out.recall == 1.0).all()


# ---------------------------------------------------------------------------
# ops_slot_sizing
# ---------------------------------------------------------------------------

def _python_wave_makespan(tasks, edges, slots):
    # longest-path level per task
    preds: dict[str, list] = {}
    for s, d in edges:
        preds.setdefault(d, []).append(s)
    dur = dict(tasks)
    level: dict[str, int] = {}

    def lv(t):
        if t not in level:
            level[t] = 1 + max((lv(p) for p in preds.get(t, [])), default=0)
        return level[t]

    for t, _ in tasks:
        lv(t)
    makespan = 0
    for l in sorted(set(level.values())):
        lt = sorted(
            [t for t, _ in tasks if level[t] == l],
            key=lambda t: (-dur[t], t),
        )
        for w in range(0, len(lt), slots):
            makespan += max(dur[t] for t in lt[w:w + slots])
    return makespan


def test_slot_sizing_matches_python(spark):
    from gcp_de_data_pipeline_cc_spark.plans.ops import _TASKS, _EDGES

    out = (
        REGISTRY["ops_slot_sizing"].spark(spark, SF_DIR)
        .toPandas().set_index("slots")
    )
    assert list(out.index) == [1, 2, 3, 4]
    for s in range(1, 5):
        assert out.loc[s, "makespan"] == _python_wave_makespan(
            _TASKS, _EDGES, s
        )


def test_slot_sizing_envelopes(spark):
    from gcp_de_data_pipeline_cc_spark.plans.ops import _TASKS

    out = (
        REGISTRY["ops_slot_sizing"].spark(spark, SF_DIR)
        .toPandas().sort_values("slots")
    )
    serial = sum(d for _, d in _TASKS)
    assert (out.serial_bound == serial).all()
    assert out.makespan.iloc[0] == serial  # one slot == serial
    # monotone: more workers never hurt; never beat the CPM floor
    assert (out.makespan.values[:-1] >= out.makespan.values[1:]).all()
    assert (out.makespan >= out.cpm_bound).all()
    assert (out.efficiency.values[:-1] >= out.efficiency.values[1:]).all()
    assert (out.speedup >= 1).all()
    assert (out.efficiency <= 1.0000001).all()
