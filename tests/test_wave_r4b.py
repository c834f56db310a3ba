"""Semantic laws for the r4b wave: DAG impact sets and collocation
lift."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.ops import _EDGES, _TASKS
from tests.conftest import SF_DIR


# ------------------------------------------------------------- impact

def _closure():
    adj = {}
    for s, d in _EDGES:
        adj.setdefault(s, set()).add(d)
    reach = {}
    def dfs(n):
        if n in reach:
            return reach[n]
        out = set()
        for d in adj.get(n, ()):
            out.add(d)
            out |= dfs(d)
        reach[n] = out
        return out
    for t, _ in _TASKS:
        dfs(t)
    return reach


def test_impact_matches_python_closure(spark):
    out = {r.task: r for r in
           REGISTRY["ops_dag_impact_set"].spark(spark, SF_DIR).collect()}
    reach = _closure()
    rev = {}
    for t, _ in _TASKS:
        rev[t] = {s for s, _ in _TASKS if t in reach[s]}
    assert set(out) == {t for t, _ in _TASKS}
    for t, _ in _TASKS:
        assert out[t].n_downstream == len(reach[t]), t
        assert out[t].n_upstream == len(rev[t]), t
        assert out[t].downstream == ",".join(sorted(reach[t])), t


def test_impact_boundary_tasks(spark):
    out = {r.task: r for r in
           REGISTRY["ops_dag_impact_set"].spark(spark, SF_DIR).collect()}
    assert out["file_sensor"].n_upstream == 0      # the root
    assert out["archive"].n_downstream == 0        # the sink
    assert out["archive"].downstream == ""
    # the root reaches everything else
    assert out["file_sensor"].n_downstream == len(_TASKS) - 1


# -------------------------------------------------------- collocations

def _write_docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_collocations_planted_mwe(spark, tmp_path):
    # "new york" always co-occurs; "of the" is frequent but both words
    # are everywhere -> lift separates them
    texts = []
    for i in range(6):
        texts.append("new york of the day")
    for i in range(6):
        texts.append("of light the of sky the")
    _write_docs(spark, tmp_path, texts)
    out = {r.bigram: r for r in
           REGISTRY["text_collocations"].spark(spark, str(tmp_path))
           .collect()}
    assert "new york" in out
    ny = out["new york"]
    assert ny.n_xy == 6 and ny.n_x == 6 and ny.n_y == 6
    if "of the" in out:
        assert ny.lift > out["of the"].lift


def test_collocations_fixture_laws(spark):
    out = REGISTRY["text_collocations"].spark(spark, SF_DIR).collect()
    assert 0 < len(out) <= 20
    lifts = [r.lift for r in out]
    assert lifts == sorted(lifts, reverse=True)
    for r in out:
        assert r.n_xy >= 5
        assert r.n_x >= r.n_xy and r.n_y >= r.n_xy
        assert r.lift > 0
