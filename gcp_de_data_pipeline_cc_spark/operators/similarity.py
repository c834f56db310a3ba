"""Embedding similarity search (op C5 + extension mandate): brute-force
cosine top-k as the exact baseline, random-hyperplane LSH bucketing as
the scale path.

Scale design (PAPERS.md: distributed top-k similarity search):

- vectors are L2-normalized once, up front, so cosine = dot product;
- the query set is small and **broadcast** — the big candidate side never
  shuffles for the join;
- per-candidate scoring is a narrow `aggregate(zip_with(...))` (JVM
  codegen, no Python);
- top-k per query uses a rank window, which Spark executes as a
  per-partition group-limit below the shuffle (WindowGroupLimit);
- brute force is O(|Q|·n) — right for moderate |Q|, and the exactness
  oracle for the LSH variant, whose bucketing cuts the candidate set to
  ~n/2^bits per query at tunable recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


#: Fixed-Q deterministic hash-rank query sample (r5 verdict task #2).
#: The evidence arms (exact brute-force recall baselines, MRR/NDCG brute
#: arm, quantization ranking evals) previously sampled queries with
#: ``vec_id % 50 == 0`` — a CORPUS-PROPORTIONAL sample, so the exact
#: baseline's cost (corpus × sample) grew QUADRATICALLY with data.  The
#: fix is an ABSOLUTE sample: rank every vec_id by a portable integer
#: hash and keep the Q smallest — the sample is exactly Q rows at any
#: corpus size, so the evidence arm is O(corpus · Q) = linear.  The hash
#: ``(vec_id * 1000003) % 7919993`` is exact int64 arithmetic in both
#: Spark and DuckDB (vec_id ≤ ~9.2e12 before overflow), ties broken by
#: vec_id → a total order, bit-identical in both engines.
QUERY_SAMPLE_Q = 64
_QS_MULT = 1000003
_QS_MOD = 7919993


def query_sample_ids(
    emb: DataFrame, q: int = QUERY_SAMPLE_Q, id_col: str = "vec_id"
) -> DataFrame:
    """The Q sampled query ids: one-column frame, Q rows regardless of
    corpus size.  Plan: TakeOrderedAndProject (per-partition top-Q then a
    Q-row driver merge) — scale-safe, no full sort."""
    h = F.pmod(F.col(id_col).cast("long") * _QS_MULT, F.lit(_QS_MOD))
    return (
        emb.select(id_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(q)
    )


def sample_queries(
    emb: DataFrame, q: int = QUERY_SAMPLE_Q, id_col: str = "vec_id"
) -> DataFrame:
    """Restrict a frame to the fixed-Q query sample via a broadcast
    LEFT SEMI join on the sampled ids (Q ≤ 128 rows broadcast — the big
    side never shuffles)."""
    ids = query_sample_ids(emb, q, id_col)
    return emb.join(F.broadcast(ids), id_col, "semi")


def sql_query_sample_cte(
    q: int = QUERY_SAMPLE_Q, table: str = "embeddings", id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`query_sample_ids` as a CTE body named ``qs``:
    splice ``qs AS ({this})`` into an oracle's WITH list and filter with
    ``{id} IN (SELECT {id} FROM qs)``."""
    return (
        f"SELECT {id_col} FROM {table} "
        f"ORDER BY ({id_col} * {_QS_MULT}) % {_QS_MOD}, {id_col} LIMIT {q}"
    )


def as_double_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Widen float32 embeddings to double once (exact) so all scoring is
    double-precision."""
    return df.withColumn(
        vec_col, F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, cos, rank).

    Self-matches are excluded. Ties break on neighbor id for determinism.
    """
    # norms are hoisted to each SIDE of the pair join: the fold value
    # is the identical expression over the identical vector, evaluated
    # once per row instead of once per pair (the division tree below
    # consumes bit-identical operands); the candidate side fans out
    # because the broadcast nested-loop join inherits the scan's
    # (under-)split and otherwise folds every pair on one core
    from gcp_de_data_pipeline_cc_spark.catalog import fan_out

    q = as_double_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
    ).withColumn("q_nrm", _norm(F.col("q_vec")))
    c = fan_out(
        as_double_vectors(candidates, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
    ).withColumn("c_nrm", _norm(F.col("c_vec")))
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    cos = (
        _dot(F.col("q_vec"), F.col("c_vec"))
        / F.col("q_nrm")
        / F.col("c_nrm")
    )
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos_raw"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            roundn(F.col("cos_raw"), 4).alias("cosine"),
            "rank",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec, planes: list[list[float]]):
    """Random-hyperplane (SimHash-for-vectors) bucket id: bit j = sign of
    <v, r_j>. Cosine-similar vectors collide with probability
    1 - θ/π per bit."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        d = _dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        sig = sig + F.when(d > 0, F.lit(2**j)).otherwise(F.lit(0))
    return sig


def with_lsh_code(
    df: DataFrame,
    bits: int,
    dim: int,
    vec_col: str = "embedding",
    out_col: str = "bucket",
    seed: int = 42,
) -> DataFrame:
    """Append one ``bits``-wide random-hyperplane code column.

    Same Arrow-batched numpy matmul as :func:`_lsh_buckets` (single
    table): one GEMM per batch instead of a ``bits × dim``-literal
    expression tree, whose driver-side analysis cost dominates at any
    scale. Bit j of the code is the sign of <v, r_j> (LSB-first, matching
    :func:`lsh_signature`)."""
    from pyspark.sql.types import LongType

    planes = np.asarray(_hyperplanes(dim, bits, seed))  # (bits, dim)
    weights = 2 ** np.arange(bits, dtype=np.int64)  # LSB-first

    @F.pandas_udf(LongType())
    def _code(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=np.int64)
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(((v @ planes.T) > 0) @ weights)

    return df.withColumn(out_col, _code(F.col(vec_col)))


def _lsh_buckets(
    df: DataFrame,
    out_id: str,
    n_tables: int,
    bits: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One (table_id, bucket) row per vector per hash table.

    The n_tables·bits hyperplane signs are computed by one Arrow-batched
    pandas UDF doing a single numpy matmul per batch. The earlier
    pure-expression formulation (a 2048-literal plane matrix walked by
    ``transform``/``aggregate``) spent 5-20 s in driver-side
    analysis/codegen per invocation; the matmul UDF keeps the plan tiny
    and is the vectorized scale path anyway (one (batch × dim) ·
    (dim × planes) GEMM per Arrow batch, no per-row Python).
    """
    from pyspark.sql.types import ArrayType, LongType

    planes = np.asarray(_hyperplanes(dim, n_tables * bits))  # (T·b, dim)
    weights = 2 ** np.arange(bits - 1, -1, -1, dtype=np.int64)  # MSB-first

    @F.pandas_udf(ArrayType(LongType()))
    def _codes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        v = np.vstack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        signs = (v @ planes.T) > 0  # (n, T·b)
        grouped = signs.reshape(len(v), -1, len(weights))  # (n, T, b)
        codes = grouped @ weights  # (n, T)
        return pd.Series(list(codes))

    # r10 (guide §4.4): the posexplode over the UDF column collapses
    # into the projection and the plan evaluates the GEMM UDF TWICE per
    # relation (two ArrowEvalPython nodes over the same input — seen in
    # every bucket consumer's plan).  Non-deterministic marking fences
    # the duplication; the function is pure, results unchanged.
    codes_once = _codes.asNondeterministic()
    return df.select(
        F.col(id_col).alias(out_id), codes_once(F.col(vec_col)).alias("_codes")
    ).select(out_id, F.posexplode("_codes").alias("table_id", "bucket"))


def ivf_centroids(
    vectors: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: element-wise mean vector per cell.

    posexplode → per-(cell, position) mean → re-assemble ordered arrays.
    Cells here come from a pre-assigned column (a trained k-means would
    produce the same shape); the centroid table is dimension-sized.
    """
    per_pos = (
        as_double_vectors(vectors, vec_col)
        .select(cell_col, F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(cell_col, "pos")
        .agg(F.avg("x").alias("m"))
    )
    return (
        per_pos.groupBy(cell_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: route each query to its ``nprobe``
    nearest cells (by centroid cosine), score only those cells' vectors.

    Cost per query drops from n to ~nprobe·n/|cells|; the centroid table
    and the query set broadcast, so the candidate scan is the only big
    side and it is filtered by cell membership *before* scoring.
    """
    cents = ivf_centroids(candidates, cell_col, vec_col)
    q = as_double_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    qc = q.crossJoin(F.broadcast(cents))
    cent_cos = (
        _dot(F.col("q_vec"), F.col("centroid"))
        / _norm(F.col("q_vec"))
        / _norm(F.col("centroid"))
    )
    w_cell = Window.partitionBy("query_id").orderBy(
        F.col("cell_cos").desc(), F.col(cell_col)
    )
    probed = (
        qc.select("query_id", "q_vec", cell_col, cent_cos.alias("cell_cos"))
        .withColumn("cell_rank", F.row_number().over(w_cell))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "q_vec", cell_col)
    )
    c = as_double_vectors(candidates, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), cell_col
    )
    pairs = c.join(F.broadcast(probed), on=cell_col).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = (
        _dot(F.col("q_vec"), F.col("c_vec"))
        / _norm(F.col("q_vec"))
        / _norm(F.col("c_vec"))
    )
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos_raw"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            roundn(F.col("cos_raw"), 4).alias("cosine"),
            "rank",
        )
    )


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with multi-table random-hyperplane LSH.

    A candidate is scored iff it shares a bucket with the query in ANY of
    the ``n_tables`` tables (recall 1-(1-p^bits)^n_tables for per-bit
    collision p = 1-θ/π) — the standard recall/cost dial. Per query,
    expected candidates ≈ n_tables · n / 2^bits ≪ n. Same output schema
    as :func:`cosine_topk`; recall is measured against it in tests.
    """
    qb = _lsh_buckets(queries, "query_id", n_tables, bits, dim, id_col, vec_col)
    cb = _lsh_buckets(candidates, "neighbor_id", n_tables, bits, dim, id_col, vec_col)
    pairs = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # per-side norm hoist (the cosine_topk discipline): the fold value
    # is the identical expression over the identical vector, evaluated
    # once per row instead of once per collided pair — the division
    # consumes bit-identical operands
    q = as_double_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_nrm", _norm(F.col("q_vec")))
    c = as_double_vectors(candidates, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("c_nrm", _norm(F.col("c_vec")))
    cos = (
        _dot(F.col("q_vec"), F.col("c_vec")) / F.col("q_nrm") / F.col("c_nrm")
    )
    scored = (
        pairs.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            roundn(F.col("cos_raw"), 4).alias("cosine"),
            "rank",
        )
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against the
    exact brute-force one: (query_id, k, n_exact, n_hit, recall).

    Both inputs are (query_id, neighbor_id, ..., rank) frames as produced
    by :func:`cosine_topk` / :func:`cosine_topk_lsh` / :func:`ivf_topk`.
    The join is a left-semi on (query_id, neighbor_id) — the hit count
    shuffles id pairs only, never vectors — and the output is one scalar
    row per query, so an approximate-search query can ship quantitative
    accuracy evidence as its driver-visible result instead of an
    unverifiable neighbor list.
    """
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hits = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    totals = e.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return (
        totals.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit(k).cast("int").alias("k"),
            F.col("n_exact").cast("int").alias("n_exact"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("int").alias("n_hit"),
            roundn(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# portable (engine-exact) integer LSH
# ---------------------------------------------------------------------------

#: 2^13 — float32→double widening, ×2^13, +0.5, floor are ALL exact IEEE
#: steps, so quantization is bit-identical on any engine
PORTABLE_Q_SCALE = 8192

#: integer hyperplane component range: |dot| ≤ dim·8192·(8192·|x|max) stays
#: far below 2^53, so the dot product is exact in BOTH int64 and double
_PORTABLE_PLANE_MAX = 8192


def portable_int_planes(
    n_planes: int, dim: int, seed: int = 424242
) -> np.ndarray:
    """Deterministic integer hyperplanes, shared verbatim by the Spark
    UDF (int64 matmul) and the DuckDB oracle (literal lists) — the
    float-hyperplane portability problem is that GEMM vs sequential-fold
    summation order flips signs near zero; integer dots are order-free
    and exact on both engines (the dedup_minhash portable-hash
    discipline applied to vectors)."""
    rng = np.random.RandomState(seed)
    return rng.randint(
        -_PORTABLE_PLANE_MAX, _PORTABLE_PLANE_MAX + 1, size=(n_planes, dim)
    ).astype(np.int64)


def portable_lsh_buckets(
    df: DataFrame,
    out_id: str,
    n_tables: int,
    bits: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One (table_id, bucket) row per vector per hash table, with
    ENGINE-EXACT bucket ids: quantize each component to
    floor(x·2^13 + 0.5) (exact), then bit j of table t = sign of the
    int64 dot with plane t·bits+j.  Vectors narrower than ``dim`` use
    the leading plane columns (planes are seeded per (n_tables·bits,
    dim), truncation keeps determinism)."""
    from pyspark.sql.types import ArrayType, LongType

    planes = portable_int_planes(n_tables * bits, dim)  # (T·b, dim)
    weights = 2 ** np.arange(bits - 1, -1, -1, dtype=np.int64)  # MSB-first

    @F.pandas_udf(ArrayType(LongType()))
    def _codes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        v = np.vstack(vecs.to_numpy()).astype(np.float64)  # exact widen
        q = np.floor(v * PORTABLE_Q_SCALE + 0.5).astype(np.int64)
        p = planes[:, : q.shape[1]]
        signs = (q @ p.T) > 0  # exact int64 matmul
        grouped = signs.reshape(len(q), -1, len(weights))  # (n, T, b)
        return pd.Series(list(grouped @ weights))

    # r10 (guide §4.4): the posexplode over the UDF column collapses
    # into the projection and the plan evaluates the GEMM UDF TWICE per
    # relation (two ArrowEvalPython nodes over the same input — seen in
    # every bucket consumer's plan).  Non-deterministic marking fences
    # the duplication; the function is pure, results unchanged.
    codes_once = _codes.asNondeterministic()
    return df.select(
        F.col(id_col).alias(out_id), codes_once(F.col(vec_col)).alias("_codes")
    ).select(out_id, F.posexplode("_codes").alias("table_id", "bucket"))


def sql_portable_lsh_buckets(
    vec_expr: str, n_tables: int, bits: int, dim: int
) -> list[str]:
    """DuckDB expressions (one per table) reproducing
    :func:`portable_lsh_buckets` bit-for-bit: the quantized components
    and integer plane literals keep every dot product below 2^53, so
    ``list_dot_product``'s double arithmetic is exact."""
    planes = portable_int_planes(n_tables * bits, dim)
    q = (
        f"list_transform({vec_expr}, "
        f"x -> FLOOR(CAST(x AS DOUBLE) * {PORTABLE_Q_SCALE}.0 + 0.5))"
    )
    exprs = []
    for t in range(n_tables):
        terms = []
        for j in range(bits):
            plane = planes[t * bits + j]
            lits = "[" + ", ".join(f"{int(x)}.0" for x in plane) + "]"
            w = 2 ** (bits - 1 - j)  # MSB-first, matching the UDF
            terms.append(
                f"CASE WHEN list_dot_product(__q, {lits}) > 0 "
                f"THEN {w} ELSE 0 END"
            )
        exprs.append(
            "(SELECT " + " + ".join(terms) + f" FROM (SELECT {q} AS __q))"
        )
    return exprs


def quantized_int_vectors(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Exact integer quantization floor(x·2^13 + 0.5) per component —
    the portable-LSH quantizer exposed for centroid building (every
    step exact IEEE, bit-identical on any engine)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(PORTABLE_Q_SCALE)) + F.lit(0.5)
            ),
        ),
    )


def cosine_topk_lsh_portable(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`cosine_topk_lsh` with ENGINE-EXACT bucketing
    (:func:`portable_lsh_buckets`): the candidate set — and therefore
    the whole result — is deterministic and SQL-reproducible, so the
    approximate search can be ORACLE-PAIRED instead of rows-only.
    Same output schema as :func:`cosine_topk`."""
    qb = portable_lsh_buckets(
        queries, "query_id", n_tables, bits, dim, id_col, vec_col
    )
    cb = portable_lsh_buckets(
        candidates, "neighbor_id", n_tables, bits, dim, id_col, vec_col
    )
    pairs = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # per-side norm hoist (the cosine_topk discipline): the fold value
    # is the identical expression over the identical vector, evaluated
    # once per row instead of once per collided pair — the division
    # consumes bit-identical operands
    q = as_double_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_nrm", _norm(F.col("q_vec")))
    c = as_double_vectors(candidates, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("c_nrm", _norm(F.col("c_vec")))
    cos = (
        _dot(F.col("q_vec"), F.col("c_vec")) / F.col("q_nrm") / F.col("c_nrm")
    )
    scored = (
        pairs.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            roundn(F.col("cos_raw"), 4).alias("cosine"),
            "rank",
        )
    )


def ivf_centroids_portable(
    vectors: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer with ENGINE-EXACT centroids: the per-cell
    per-position SUM of integer-quantized components (int64 — exact
    and summation-order-free, unlike a float mean).  Cosine is
    scale-invariant, so the un-normalized sum vector ranks cells
    identically to the mean — no division, no float accumulation."""
    per_pos = (
        quantized_int_vectors(vectors, vec_col, "qvec")
        .select(cell_col, F.posexplode("qvec").alias("pos", "x"))
        .groupBy(cell_col, "pos")
        .agg(F.sum("x").alias("s"))
    )
    return per_pos.groupBy(cell_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda st: st.getField("s").cast("double"),
        ).alias("centroid")
    )


def ivf_probe_portable(
    queries: DataFrame,
    candidates: DataFrame,
    nprobe: int = 3,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cell): each query's ``nprobe`` nearest coarse cells by
    cosine against the engine-exact integer-sum centroids — the probe
    stage alone, for composed indexes (IVF+PQ) that score the probed
    cells with a different fine quantizer."""
    cents = ivf_centroids_portable(candidates, cell_col, vec_col)
    q = as_double_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    qc = q.crossJoin(F.broadcast(cents))
    cent_cos = (
        _dot(F.col("q_vec"), F.col("centroid"))
        / _norm(F.col("q_vec"))
        / _norm(F.col("centroid"))
    )
    w_cell = Window.partitionBy("query_id").orderBy(
        F.col("cell_cos").desc(), F.col(cell_col)
    )
    return (
        qc.select("query_id", cell_col, cent_cos.alias("cell_cos"))
        .withColumn("cell_rank", F.row_number().over(w_cell))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", cell_col)
    )


def ivf_topk_portable(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`ivf_topk` with engine-exact centroids
    (:func:`ivf_centroids_portable`) — probing is deterministic and
    SQL-reproducible, so the IVF search can be oracle-paired."""
    cents = ivf_centroids_portable(candidates, cell_col, vec_col)
    q = as_double_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    qc = q.crossJoin(F.broadcast(cents))
    cent_cos = (
        _dot(F.col("q_vec"), F.col("centroid"))
        / _norm(F.col("q_vec"))
        / _norm(F.col("centroid"))
    )
    w_cell = Window.partitionBy("query_id").orderBy(
        F.col("cell_cos").desc(), F.col(cell_col)
    )
    probed = (
        qc.select("query_id", "q_vec", cell_col, cent_cos.alias("cell_cos"))
        .withColumn("cell_rank", F.row_number().over(w_cell))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "q_vec", cell_col)
    )
    c = as_double_vectors(candidates, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        cell_col,
    )
    pairs = c.join(F.broadcast(probed), on=cell_col).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = (
        _dot(F.col("q_vec"), F.col("c_vec"))
        / _norm(F.col("q_vec"))
        / _norm(F.col("c_vec"))
    )
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos_raw"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            roundn(F.col("cos_raw"), 4).alias("cosine"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# bounded-cell coarse quantizer (r7 verdict task #1)
# ---------------------------------------------------------------------------

#: hard per-cell size bound for the rank-chunked coarse quantizer: any
#: label cell above this splits into contiguous projection-order chunks
#: of at most this many vectors, so candidate joins scoped to
#: (label, chunk) cost Sigma|cell|^2 <= n * bound BY CONSTRUCTION —
#: never corpus^2, no matter how skewed the labels get
BOUNDED_CELL_SIZE = 32


def _bounded_cell_plane(dim: int) -> np.ndarray:
    """The single deterministic integer projection plane shared verbatim
    by the Spark expression and the DuckDB twin (portable_int_planes
    seed; plane 0 of a 1-plane family)."""
    return portable_int_planes(1, dim)[0]


def bounded_cells(
    df: DataFrame,
    bound: int = BOUNDED_CELL_SIZE,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    out_col: str = "chunk",
    keep_proj: str | None = None,
) -> DataFrame:
    """Adds ``out_col``: the BOUNDED-CELL id within each label cell.

    The coarse quantizer behind the ANN/semantic-dedup tier previously
    used the raw label column as the cell, so replicated/skewed corpora
    concentrated all growth into a fixed number of cells and every
    cell-scoped pair join degraded toward corpus². This is the fix the
    production IVF literature applies (re-split oversized cells): rank
    each label's vectors by a deterministic 1-D projection (exact int64
    dot of the 2^13-quantized vector with a fixed integer hyperplane —
    a locality-preserving order, so near-duplicates stay chunk-mates
    except at chunk boundaries) and cut the ranked run into chunks of
    at most ``bound`` vectors. |cell| ≤ bound is a HARD invariant; the
    cell COUNT grows with the corpus instead.

    Exactness: the projection is exact integer arithmetic (components
    ≤ 2^13, plane entries ≤ 2^13, dim ≤ 64 → |dot| < 2^33), ties break
    on the id — a total order, bit-identical in DuckDB
    (:func:`sql_bounded_cells_order`).

    100 TB: one rank-within-label sort (the hilbert_layout cost class)
    replaces unbounded quadratic growth in every downstream
    (label, chunk)-scoped join; the projection itself is map-side
    codegen."""
    plane = _bounded_cell_plane(dim)
    plane_arr = F.array(*[F.lit(int(x)) for x in plane])
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            x.cast("double") * F.lit(float(PORTABLE_Q_SCALE)) + F.lit(0.5)
        ).cast("long"),
    )
    # dot over EXACTLY dim positions: vectors longer than dim are
    # truncated, shorter ones zero-padded (identical to a prefix dot).
    # The earlier zip_with(slice(plane, size(vec)), q) form null-padded
    # the plane when size(vec) > dim and silently yielded a NULL
    # projection — the r7 ADVICE divergence.  F.get is total (NULL out
    # of bounds, no ANSI error), so the fold can never go NULL.
    proj = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(int(dim))),
            lambda i: F.get(plane_arr, i - 1)
            * F.coalesce(F.get(q, i - 1), F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(label_col).orderBy(
        F.asc("__bc_proj"), F.asc(id_col)
    )
    out = df.withColumn("__bc_proj", proj).withColumn(
        out_col,
        F.floor(
            (F.row_number().over(w) - F.lit(1)) * F.lit(1.0)
            / F.lit(float(bound))
        ).cast("long"),
    )
    if keep_proj is not None:
        return out.withColumnRenamed("__bc_proj", keep_proj)
    return out.drop("__bc_proj")


def sql_bounded_cells_proj(vec_expr: str, dim: int = 64) -> str:
    """The DuckDB twin of :func:`bounded_cells`' integer projection
    (exact: quantized components x integer plane, all < 2^53).  Same
    truncate-to-dim / zero-pad totalization as the Spark side: list
    indexing past the end is NULL in DuckDB, coalesced to 0, so both
    engines agree on any vector length instead of one erroring."""
    plane = _bounded_cell_plane(dim)
    lits = "[" + ", ".join(f"{int(x)}.0" for x in plane) + "]"
    qexpr = (
        f"list_transform(range(1, {dim} + 1), "
        f"i -> COALESCE(FLOOR(CAST({vec_expr}[i] AS DOUBLE) "
        f"* {PORTABLE_Q_SCALE}.0 + 0.5), 0.0))"
    )
    return f"list_dot_product({qexpr}, {lits})"


def sql_bounded_cells_order(
    vec_expr: str, id_expr: str, dim: int = 64
) -> str:
    """The DuckDB ORDER BY twin of :func:`bounded_cells`' ranking:
    ``ROW_NUMBER() OVER (PARTITION BY label ORDER BY {this})`` with the
    identical integer projection and id tie-break."""
    return f"{sql_bounded_cells_proj(vec_expr, dim)}, {id_expr}"


def sql_bounded_cells_chunk(bound: int = BOUNDED_CELL_SIZE) -> str:
    """The chunk expression over the twin's row number ``rn``."""
    return f"CAST(FLOOR((rn - 1) * 1.0e0 / {bound}) AS BIGINT)"
