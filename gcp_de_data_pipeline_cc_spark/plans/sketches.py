"""Sketch algebra wave: MERGEABLE MinHash sketches at corpus scope.

`dedup_minhash` (plans/llm.py) uses MinHash per document to find
near-dup pairs. This wave exercises the property that makes sketches
the 100 TB tool: they MERGE. A MinHash signature is an elementwise MIN,
so the signature of a UNION of sets is the elementwise MIN of the
parts' signatures — per-partition partial sketches combine
associatively into per-source sketches with no rescan, exactly like a
partial aggregate (and exactly how HLL sketches roll up in
`sketch_hll_rollup`).

**sketch_minhash_union** — per-SOURCE corpus signatures built by
min-merging the per-document signatures, then a pairwise source
similarity matrix: est_jaccard(a, b) = fraction of agreeing signature
components (the standard unbiased MinHash estimator), reported beside
the EXACT source-level shingle Jaccard so the estimate's error is
driver-visible in every row.

Exactness: the portable per-char shingle hash + seed-42 affine perms
(operators/dedup) make every signature component exact integer
arithmetic both engines reproduce bit-for-bit; the estimator is a
count/16 (a dyadic rational — exact in doubles). Only the exact-Jaccard
ratio is rounded, identically, at projection.

100 TB scale: per-doc signatures are one explode+groupBy carrying
(doc, hash) longs; the source merge is a second tiny aggregate over
|docs| fixed-width rows (map-side combined — this is the mergeability
argument in action). The pairwise stage runs over |sources| sketch
rows, unpivoted to (source, component) and equi-joined on the
component index — bounded by |sources|² · 16 with no row-data
involvement, and no nested-loop join. The exact-Jaccard audit column
is the one piece that would be sampled (not dropped) at frontier
scale; its shingle self-join is the Σ|bucket|² profile shared with
`dedup_ngram_jaccard`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.operators import dedup as dd
from gcp_de_data_pipeline_cc_spark.operators.dedup import _doc_shingles
from gcp_de_data_pipeline_cc_spark.plans.llm import (
    _MINHASH_CHARFOLD,
    _SHINGLES_SQL,
)
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: signature width — 16 components keeps the estimator grid at 1/16
_PERMS = 16


def _union_oracle() -> str:
    params = dd._hash_params(_PERMS)
    doc_sigs = ",\n               ".join(
        f"MIN(({a} * h + {b}) % 2147483647) AS sig_{i}"
        for i, (a, b) in enumerate(params)
    )
    src_sigs = ",\n               ".join(
        f"MIN(sig_{i}) AS sig_{i}" for i in range(_PERMS)
    )
    agree = " + ".join(
        f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END"
        for i in range(_PERMS)
    )
    return f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, source, UNNEST({_SHINGLES_SQL}) AS shingle
        FROM (SELECT doc_id, source, string_split(text, ' ') AS t
              FROM documents)
        WHERE len(t) >= 3),
    h AS (SELECT doc_id, source, {_MINHASH_CHARFOLD} AS h FROM sh),
    doc_sig AS (
        SELECT doc_id, source,
               {doc_sigs}
        FROM h GROUP BY 1, 2),
    src_sig AS (
        SELECT source,
               {src_sigs}
        FROM doc_sig GROUP BY 1),
    est AS (
        SELECT a.source AS src_a, b.source AS src_b,
               ({agree}) / 16.0e0 AS est_jaccard
        FROM src_sig a JOIN src_sig b ON a.source < b.source),
    ssh AS (SELECT DISTINCT source, shingle FROM sh),
    cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
            FROM ssh GROUP BY 1),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ssh a JOIN ssh b
          ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY 1, 2),
    ex AS (
        SELECT i.src_a, i.src_b,
               i.n_both * 1.0e0 / (ca.n + cb.n - i.n_both) AS exact_raw
        FROM inter i
        JOIN cnt ca ON ca.source = i.src_a
        JOIN cnt cb ON cb.source = i.src_b)
    SELECT e.src_a, e.src_b, e.est_jaccard,
           {sql_roundn("COALESCE(ex.exact_raw, 0.0e0)", 6)} AS exact_jaccard,
           {sql_roundn(
               "ABS(e.est_jaccard - COALESCE(ex.exact_raw, 0.0e0))", 6
           )} AS abs_err
    FROM est e
    LEFT JOIN ex ON ex.src_a = e.src_a AND ex.src_b = e.src_b
    ORDER BY e.src_a, e.src_b
    """


@query("sketch_minhash_union", oracle=_union_oracle())
def sketch_minhash_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-merge per-doc MinHash signatures into per-source corpus
    sketches, estimate every pairwise source Jaccard from component
    agreement, and audit against the exact shingle Jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = dd.minhash_signatures(docs, num_perms=_PERMS, k=3)
    src_map = docs.select("doc_id", "source")
    # the mergeability step: per-source sketch = elementwise MIN of the
    # per-doc sketches (associative — partials combine map-side)
    per_source = (
        sigs.join(src_map, "doc_id")
        .groupBy("source")
        .agg(*[F.min(f"sig_{i}").alias(f"sig_{i}") for i in range(_PERMS)])
    )
    # both sides of the pairwise self-join consume the sketch table —
    # materialize the |sources| rows once or the whole signature build
    # (explode + 16-way min agg) plans twice (census diamond rule)
    per_source = per_source.localCheckpoint(eager=False)
    stack_args = ", ".join(f"{i}, sig_{i}" for i in range(_PERMS))
    comp = per_source.select(
        "source", F.expr(f"stack({_PERMS}, {stack_args}) as (i, sig)")
    )
    a, b = comp.alias("a"), comp.alias("b")
    est = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(
            (
                F.sum(
                    F.when(F.col("a.sig") == F.col("b.sig"), 1).otherwise(0)
                )
                / F.lit(16.0)
            ).alias("est_jaccard")
        )
    )
    ssh = _doc_shingles(docs, "source", "text", 3).localCheckpoint(
        eager=False
    )
    cnt = ssh.groupBy("source").agg(F.count("*").alias("n"))
    sa, sb = ssh.alias("sa"), ssh.alias("sb")
    inter = (
        sa.join(
            sb,
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.source") < F.col("sb.source")),
        )
        .groupBy(
            F.col("sa.source").alias("src_a"),
            F.col("sb.source").alias("src_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    ca = cnt.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    ex = (
        inter.join(F.broadcast(ca), "src_a")
        .join(F.broadcast(cb), "src_b")
        .select(
            "src_a",
            "src_b",
            (
                F.col("n_both")
                * F.lit(1.0)
                / (F.col("na") + F.col("nb") - F.col("n_both"))
            ).alias("exact_raw"),
        )
    )
    exact_raw = F.coalesce(F.col("exact_raw"), F.lit(0.0))
    return (
        est.join(ex, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "est_jaccard",
            roundn(exact_raw, 6).alias("exact_jaccard"),
            roundn(F.abs(F.col("est_jaccard") - exact_raw), 6).alias(
                "abs_err"
            ),
        )
        .orderBy("src_a", "src_b")
    )
