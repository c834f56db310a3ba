"""Capture `.explain("formatted")` for registry keys → plans/r10/ files.

Optimization-round evidence: the judge cannot run Spark, so every claim
about a plan change ("2 Exchange → 1", "SortMergeJoin →
BroadcastHashJoin") is checked against these committed files.

r10 upgrade (r9 verdict task #8): queries segmented by
``localCheckpoint`` hide their rewritten subtrees behind
``Scan ExistingRDD`` — the r9 geo_cluster_grid / sim_topk_pq dumps were
vacuous because only the post-checkpoint tail was captured.  This tool
now monkeypatches ``DataFrame.localCheckpoint`` during plan
construction and appends the PRE-checkpoint sub-plan of every
checkpointed intermediate (in creation order) after the top-level
plan, so checkpoint-hidden rewrites are verifiable.

Usage:
    python tools/opt_explain.py before <key> [<key> ...]
    python tools/opt_explain.py after  <key> [<key> ...]

Writes plans/r10/<key>_<stage>.txt (sf dir from $SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.1 — the bench scale, so AQE-pre plans match
what the bench executes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    stage = sys.argv[1]
    assert stage in ("before", "after"), stage
    keys = sys.argv[2:]

    import pyspark.sql.classic.dataframe as _dfmod

    from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
    from gcp_de_data_pipeline_cc_spark.session import build_session

    spark = build_session(
        app_name=f"opt-explain-{stage}", extra_conf={"spark.ui.enabled": "false"}
    )
    os.makedirs(OUT_DIR, exist_ok=True)

    orig_lck = _dfmod.DataFrame.localCheckpoint
    records: list[str] = []

    def recording_lck(self, *args, **kwargs):
        # capture the sub-plan that the checkpoint is about to hide;
        # explain only (no execution) — the checkpoint stays lazy
        try:
            records.append(_explain(self))
        except Exception as exc:  # pragma: no cover — capture must not break
            records.append(f"<explain failed: {exc}>")
        return orig_lck(self, *args, **kwargs)

    for key in keys:
        records.clear()
        _dfmod.DataFrame.localCheckpoint = recording_lck
        try:
            df = REGISTRY[key].spark(spark, SF_DIR)
        finally:
            _dfmod.DataFrame.localCheckpoint = orig_lck
        parts = [f"== TOP-LEVEL PLAN: {key} ==\n" + _explain(df)]
        for i, sub in enumerate(records):
            parts.append(
                f"\n\n== PRE-CHECKPOINT SUB-PLAN {i} (creation order) ==\n"
                + sub
            )
        txt = "".join(parts)
        path = os.path.join(OUT_DIR, f"{key}_{stage}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes, {len(records)} sub-plans)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
