"""Semantic laws for the r6h wave: intra-list diversity + directed
motif census."""

from __future__ import annotations

import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# recsys_diversity_ild
# --------------------------------------------------------------------------


def test_ild_matches_python_recompute(spark):
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT DISTINCT o.o_custkey, p.p_brand
        FROM '{SF_DIR}/lineitem.parquet' l
        JOIN '{SF_DIR}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{SF_DIR}/part.parquet' p ON l.l_partkey = p.p_partkey
        """
    ).fetchall()
    by_cust, n_cust = {}, {}
    for c, brand in rows:
        by_cust.setdefault(c, set()).add(brand)
        n_cust[brand] = n_cust.get(brand, 0) + 1
    co = {}
    for c, brands in by_cust.items():
        bs = sorted(brands)
        for i, x in enumerate(bs):
            for y in bs[i + 1:]:
                co[(x, y)] = co.get((x, y), 0) + 1

    def cos(x, y):
        k = (min(x, y), max(x, y))
        if k not in co:
            return None
        return co[k] / math.sqrt(n_cust[x] * n_cust[y])

    # top-5 lists with (cos desc, neighbor) ordering
    lists = {}
    for item in n_cust:
        scored = [
            (cos(item, nb), nb) for nb in n_cust if nb != item
            and cos(item, nb) is not None
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        lists[item] = [nb for _, nb in scored[:5]]
    out = (
        REGISTRY["recsys_diversity_ild"].spark(spark, SF_DIR).toPandas()
        .set_index("item")
    )
    for item, lst in lists.items():
        if len(lst) < 2:
            continue
        total, unseen, n = 0, 0, 0
        for i, x in enumerate(lst):
            for y in lst[i + 1:]:
                cv = cos(x, y)
                q = 0 if cv is None else math.floor(cv * 1e6 + 0.5)
                if cv is None:
                    unseen += 1
                total += 1_000_000 - q
                n += 1
        assert out.loc[item, "n_pairs"] == n
        assert out.loc[item, "ild_ppm"] == total // n
        assert out.loc[item, "n_never_cobought"] == unseen


def test_ild_bounds(spark):
    out = REGISTRY["recsys_diversity_ild"].spark(spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert ((out.ild_ppm >= 0) & (out.ild_ppm <= 1_000_000)).all()
    assert (out.n_pairs <= 10).all()
    assert (out.n_never_cobought <= out.n_pairs).all()


# --------------------------------------------------------------------------
# graph_motifs_directed
# --------------------------------------------------------------------------


def test_motifs_match_python(spark):
    import duckdb

    edges = set(
        duckdb.sql(
            f"""
            SELECT src, dst FROM (
                SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
                                    ORDER BY w DESC, dst) rn
                FROM (SELECT c.c_nationkey src, s.s_nationkey dst,
                             COUNT(*) w
                      FROM '{SF_DIR}/lineitem.parquet' l
                      JOIN '{SF_DIR}/orders.parquet' o
                        ON l.l_orderkey = o.o_orderkey
                      JOIN '{SF_DIR}/customer.parquet' c
                        ON o.o_custkey = c.c_custkey
                      JOIN '{SF_DIR}/supplier.parquet' s
                        ON l.l_suppkey = s.s_suppkey
                      WHERE c.c_nationkey <> s.s_nationkey
                      GROUP BY 1, 2)) WHERE rn <= 3
            """
        ).fetchall()
    )
    paths = ffl = cyc = 0
    for a, b in edges:
        for b2, c in edges:
            if b2 != b or c == a:
                continue
            paths += 1
            if (a, c) in edges:
                ffl += 1
            if (c, a) in edges:
                cyc += 1
    out = (
        REGISTRY["graph_motifs_directed"].spark(spark, SF_DIR)
        .toPandas().iloc[0]
    )
    assert out.n_two_paths == paths
    assert out.n_ffl == ffl
    assert out.n_cycles == cyc // 3
    assert out.ffl_closure_ppm == ffl * 1_000_000 // paths
    # every 3-cycle closes exactly 3 of the counted 2-paths
    assert cyc % 3 == 0
