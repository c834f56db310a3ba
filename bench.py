"""Benchmark harness — runs the registry's queries at $SPARK_GRAFT_SF_DIR.

Prints ONE SHORT JSON summary line on stdout:
    {"metric": "...", "value": N, "unit": "sec", "sf": ..., "queries": {...top-5...}}

The driver's output capture is tail-truncated, so the stdout line must
stay small (round-1's ~3.2 KB line with all 120 per-query timings came
back ``parsed: null``).  The FULL per-query timing map goes to
``bench_detail.json`` next to this file and to stderr.

Each query is forced to full materialization with a noop-format write
(exercises the complete plan including the final exchange, without
driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json")

# ---------------------------------------------------------------------------
# Bench tiers (r6 verdict "What's wrong #1"): the blended s/query number
# stopped tracking serving-path health because every wave deliberately
# adds heavyweight EVIDENCE keys (exact brute-force recall arms, full
# differential accuracy evals, leave-one-out retrains).  Each key is
# classified once here so BENCH_r{N} carries per-tier subtotals and the
# 2x driver bar is watched on the tier it's meant to protect.
# ---------------------------------------------------------------------------

#: keys whose cost IS the evidence: an exact/brute-force arm, a full
#: accuracy differential, a deliberate sweep/ablation/retrain — their
#: wall time measures the strength of the guarantee, not serving health
#: PREFIX patterns (matched with startswith — a bare "eval_" substring
#: also matches "retrieval_*" and misroutes serving keys, the r7 ADVICE)
_EVIDENCE_PREFIXES = (
    "sim_topk",            # every rung reports recall vs exact brute force
    "eval_",               # eval harness (BLEU/ROUGE/elo/pass@k/agreement)
    "ab_",                 # experiment-analysis arms
    "hypothesis_",
    "attribution_",
    "sim_index_",          # index lifecycle audits
)

#: infix patterns (genuinely positional anywhere in the key)
_EVIDENCE_INFIXES = (
    "_vs_brute",
    "_accuracy_eval",
    "_calibration",
    "_sweep",
    "_ablation",
    "_backtest",
    "_eval",
)

#: exact keys whose cost IS the evidence by workload
_EVIDENCE_KEYS = frozenset({
    "corpus_dedup_rate",   # TRUE-pair relation is quadratic by workload
    "recsys_hit_rate",     # real leave-last-out retrain
    "recsys_coverage",
    "recsys_diversity_ild",
    "embedding_knn_outliers",
    "dedup_semdedup",
    "ops_schedule_monte_carlo",
    # r9 re-tier (r8 verdict "What's wrong #2"): brute-force graph
    # verification arms whose SCALABLE twin is the serving path — their
    # wall time measures the strength of the cross-check, which is the
    # definition of this tier. (graph_bfs_khop / kmeans_iterate were
    # reviewed under the same rule and stay serving: real operators
    # with no brute/scalable split.)
    "graph_articulation",  # |V|+1 deletion-sweep; twin: graph_articulation_tarjan
    "graph_betweenness",   # exact Brandes; twin: graph_betweenness_sampled
})


#: ~20 pinned keys spanning tiers and plan classes, timed FIRST in
#: every bench run (r8 verdict task #4): their subtotal is the
#: host-offset CANARY — a cross-round denominator measured inside the
#: same session as the main loop, so "this round's numbers are N%
#: host-banded" becomes a measurement instead of an after-the-fact
#: reconstruction. The canary pre-pass is EXTRA (its keys are timed
#: again in the main loop), so `value` stays comparable with r1-r8.
#: DO NOT edit this tuple — cross-round comparability is the point.
_CANARY_KEYS = (
    "qc_count_nonempty", "agg_grouped", "agg_rollup",
    "join_broadcast", "join_sortmerge",
    "win_rank_topn", "topk_global", "sort_global",
    "tpch_q1_pricing_summary", "tpch_q6_forecast_revenue",
    "dedup_exact", "text_tokens", "fn_string", "sql_cte_reuse",
    "ts_ewma", "graph_pagerank",
    "udf_pandas_scalar", "udtf_grouped_map",   # python-worker path
    "sim_topk_lsh", "eval_bleu",               # evidence tier
    "stream_tumbling",                         # streaming tier (batch form)
)


def tier_of(name: str) -> str:
    if name.startswith("stream_"):
        return "streaming"
    if (
        name in _EVIDENCE_KEYS
        or name.startswith(_EVIDENCE_PREFIXES)
        or any(p in name for p in _EVIDENCE_INFIXES)
    ):
        return "evidence"
    return "serving"


def _warm_streaming(spark) -> None:
    """Throwaway micro-stream: 2 micro-batches through a python keyed
    state operator into a memory sink — first-streaming-query session
    cost (engine threads, state store, streaming Arrow) lands here,
    outside every timed section."""
    from pyspark.sql import functions as F

    from gcp_de_data_pipeline_cc_spark.scratch import scratch_dir
    from gcp_de_data_pipeline_cc_spark.streaming.stateful import (
        running_user_totals_from_partials,
    )

    src = scratch_dir("bench_stream_warm")
    base = spark.range(0, 64).select(
        F.pmod("id", F.lit(8)).alias("user_id"),
        F.lit(1).cast("long").alias("n"),
        F.lit(1.0).alias("v"),
    )
    for h in (0, 1):
        base.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema("user_id BIGINT, n BIGINT, v DOUBLE").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            running_user_totals_from_partials(sdf)
            .writeStream.format("memory")
            .queryName("bench_stream_warm")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def infer_sf(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = build_session(app_name="bench", extra_conf={"spark.ui.enabled": "false"})
    # warm the JVM, codegen, and parquet reader outside the timed section
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    REGISTRY["qc_count_nonempty"].spark(spark, SF_DIR).collect()
    REGISTRY["agg_grouped"].spark(spark, SF_DIR).collect()
    # warm the Python worker pool (one worker per core) so the first
    # Python-path query in the alphabet doesn't absorb the whole pool's
    # spin-up cost in its own timing
    spark.range(0, 32 * 100, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # the Python DataSource read path has its own one-time init (plan
    # pickling + its own worker spin-up, ~6 s) separate from the pandas
    # UDF pool — warm it with a tiny read
    from gcp_de_data_pipeline_cc_spark.sources.synthetic import (
        SyntheticRowsDataSource,
    )
    spark.dataSource.register(SyntheticRowsDataSource)
    spark.read.format("synthetic_rows").option("n", "64").option(
        "num_partitions", "8"
    ).load().write.format("noop").mode("overwrite").save()
    # the Python DataSource WRITE path has its own one-time init
    # (writer pickling + commit-protocol spin-up, measured ~3.7 s —
    # avro_roundtrip cold 5.2 s vs warm 1.4 s) separate from the read
    # path above — warm it with a tiny pyavro roundtrip (r9)
    from gcp_de_data_pipeline_cc_spark.scratch import scratch_dir
    from gcp_de_data_pipeline_cc_spark.sources.avro_py import PyAvroDataSource
    try:
        spark.dataSource.register(PyAvroDataSource)
    except Exception:
        pass  # already registered in this session
    avro_warm = scratch_dir("bench_avro_warm")
    spark.range(0, 8).selectExpr("id AS a").write.format("pyavro").mode(
        "overwrite"
    ).save(avro_warm)
    spark.read.format("pyavro").load(avro_warm).write.format("noop").mode(
        "overwrite"
    ).save()
    # the streaming engine has its own one-time init (StreamExecution
    # threads, state-store provider, streaming Arrow path, checkpoint
    # dir handling) — warm it with a throwaway 2-batch micro-stream so
    # the alphabetically-first stream key doesn't absorb it (r8: the
    # streaming tier's 34.6 s outlier landed on stream_custom_stateful)
    _warm_streaming(spark)

    names = sorted(REGISTRY)
    only = sys.argv[1:]
    if only:
        # exact key or prefix, so `bench.py tpch_q6` hits the full key
        names = [n for n in names if any(n == o or n.startswith(o) for o in only)]

    # canary pre-pass: the pinned subset, timed first, full-run only
    # (a key-filtered invocation is a dev loop, not an official shape)
    canary: dict[str, object] = {}
    if not only:
        canary_timings: dict[str, float] = {}
        for name in _CANARY_KEYS:
            spec = REGISTRY[name]
            t0 = time.perf_counter()
            spec.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            canary_timings[name] = round(time.perf_counter() - t0, 3)
        csec = round(sum(canary_timings.values()), 3)
        canary = {
            "n": len(canary_timings),
            "sec": csec,
            "s_per_query": round(csec / len(canary_timings), 3),
        }

    timings: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        spec.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    tiers: dict[str, dict[str, float]] = {}
    for name, sec in timings.items():
        t = tiers.setdefault(tier_of(name), {"n": 0, "sec": 0.0})
        t["n"] += 1
        t["sec"] += sec
    for t in tiers.values():
        t["sec"] = round(t["sec"], 3)
        t["s_per_query"] = round(t["sec"] / t["n"], 3)
    detail = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": infer_sf(SF_DIR),
        "n_queries": len(timings),
        "canary": canary,
        "tiers": tiers,
        "queries": timings,
    }
    # key-filtered invocations are dev loops — never clobber the full-run
    # detail file (it may be the round's official per-key record)
    path = DETAIL_PATH if not only else DETAIL_PATH.replace(
        ".json", "_dev.json"
    )
    with open(path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=False)
    print(json.dumps(detail["queries"]), file=sys.stderr)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": infer_sf(SF_DIR),
        "n_queries": len(timings),
        "canary": canary,
        "tiers": tiers,
        "queries": slowest,
        "detail_file": os.path.basename(path),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
