"""Graph analytics over the trade network.

Companion to the iterative dedup clustering
(operators/dedup.connected_components): a second iterative-algorithm
shape — weighted PageRank — but with a *fixed* iteration count, which
makes it fully SQL-expressible and therefore oracle-paired (the
recursive-CTE-free unrolling: one CTE per iteration).

Graph: nations as nodes; an edge cust_nation → supp_nation weighted by
the number of lineitems shipped between them (the TPC-H Q7 join shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

_DAMP = 0.85
_ITERS = 3


def _oracle() -> str:
    """Unrolled PageRank: r_{t+1}(v) = (1-d)/N + d·Σ_u r_t(u)·w(u,v)/out(u)."""
    prelude = """
    WITH e AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
    en AS (
        SELECT e.src, e.dst, e.w / ow.ow AS p
        FROM e JOIN (SELECT src, SUM(w) AS ow FROM e GROUP BY 1) ow
          ON e.src = ow.src),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f"""
    r{i} AS (
        SELECT nodes.node,
               {1 - _DAMP} / (SELECT n FROM nn)
                   + {_DAMP} * COALESCE(inc.s, 0.0) AS rank
        FROM nodes
        LEFT JOIN (SELECT en.dst, SUM(r{i-1}.rank * en.p) AS s
                   FROM en JOIN r{i-1} ON r{i-1}.node = en.src
                   GROUP BY en.dst) inc
          ON inc.dst = nodes.node)""")
    final = f"""
    SELECT node, {sql_roundn("rank", 6)} AS rank
    FROM r{_ITERS}"""
    return prelude + "," + ",".join(steps) + final


@query("graph_pagerank", oracle=_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, {iters} fixed iterations, damping {d}: the
    iterative-refinement pattern done Spark-first. Edge weights are
    aggregated ONCE (the only scan of the big fact join); each iteration
    is then a broadcast of the 25-row rank vector into the edge table +
    one aggregation — at 100 TB the per-iteration cost is proportional
    to |edges|, never to |lineitem|. The rank vector is explicitly
    broadcast: the iteration never shuffles the edge table.

    Fixed iteration count keeps the computation SQL-expressible; the
    convergence-loop variant of this shape is dedup_clusters
    (operators/dedup.connected_components), which the driver checks
    rows-only for exactly that reason.
    """.format(iters=_ITERS, d=_DAMP)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            c["c_nationkey"].alias("src"), s["s_nationkey"].alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    ow = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # Materialize the (tiny) normalized edge table once and cut lineage:
    # every iteration reuses it, and without the cut the returned plan
    # would re-run the 4-table fact join per iteration. localCheckpoint
    # is eager, so no cache-unpersist lifetime to manage (cf. the scd2
    # cache-leak advisory); swap for checkpoint() on a real cluster.
    en = (
        e.join(ow, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .localCheckpoint()
    )
    nodes = n.select(F.col("n_nationkey").alias("node"))
    n_nodes = nodes.count()  # one scalar; nation is a 25-row dim

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(_ITERS):
        contrib = (
            en.join(F.broadcast(ranks), en["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("incoming"))
        )
        ranks = nodes.join(
            F.broadcast(contrib), nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit((1 - _DAMP) / n_nodes)
                + F.lit(_DAMP) * F.coalesce("incoming", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", roundn(F.col("rank"), 6).alias("rank"))
