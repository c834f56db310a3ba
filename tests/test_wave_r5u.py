"""Semantic laws for the r5u wave: LTTB downsampling + stratified
sharding."""

from __future__ import annotations

import datetime
import hashlib

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

K = 60


# --------------------------------------------------------------------------
# ts_downsample_lttb
# --------------------------------------------------------------------------


def _lttb_python(points, k):
    """The exact variant under test: integer-div equal-population
    buckets, next-bucket centroid, first-max tie-break."""
    n = len(points)
    if n <= k:
        return list(points)
    first, last, mid = points[0], points[-1], points[1:-1]
    buckets = {}
    for j, p in enumerate(mid):
        buckets.setdefault(j * (k - 2) // (n - 2), []).append(p)
    bids = sorted(buckets)
    sel = [first]
    for bi, b in enumerate(bids):
        if bi + 1 < len(bids):
            nxt = buckets[bids[bi + 1]]
            nax = sum(p[0] for p in nxt) / len(nxt)
            nay = sum(p[1] for p in nxt) / len(nxt)
        else:
            nax, nay = float(last[0]), float(last[1])
        px, py = float(sel[-1][0]), float(sel[-1][1])
        best, best_area = None, -1.0
        for (cx, cy) in buckets[b]:
            area = abs((px - nax) * (cy - py) - (px - cx) * (nay - py))
            if area > best_area:
                best, best_area = (cx, cy), area
        sel.append(best)
    sel.append(last)
    return sel


def test_lttb_matches_python_recompute_exactly(spark):
    import duckdb

    src = duckdb.sql(
        f"""
        SELECT datediff('day', (SELECT MIN(CAST(o_orderdate AS DATE))
                                FROM '{SF_DIR}/orders.parquet'),
                        CAST(o_orderdate AS DATE)) AS xd,
               SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS y
        FROM '{SF_DIR}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    expect = _lttb_python([(int(a), int(b)) for a, b in src], K)
    out = (
        REGISTRY["ts_downsample_lttb"].spark(spark, SF_DIR).toPandas()
    )
    got = list(zip(out.x_day.astype(int), out.y_cents.astype(int)))
    assert got == [(int(a), int(b)) for a, b in expect]


def test_lttb_shape_laws(spark):
    out = REGISTRY["ts_downsample_lttb"].spark(spark, SF_DIR).toPandas()
    assert len(out) == K
    assert list(out.sel_idx) == list(range(1, K + 1))
    # x strictly increasing; endpoints preserved
    assert out.x_day.is_monotonic_increasing
    assert out.x_day.nunique() == K
    assert out.x_day.iloc[0] == 0


def test_lttb_preserves_planted_spike(spark, tmp_path):
    # 200 flat days + one huge spike: the spike's triangle dwarfs every
    # neighbour, so LTTB must keep it; uniform sampling would miss it.
    rows = []
    for i in range(200):
        price = 500000.0 if i == 77 else 100.0
        rows.append(
            (i, 1, "O", price,
             datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
             "1-A")
        )
    spark.createDataFrame(
        rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = (
        REGISTRY["ts_downsample_lttb"]
        .spark(spark, str(tmp_path))
        .toPandas()
    )
    assert 77 in set(out.x_day)
    assert out.y_cents.max() == 50000000


# --------------------------------------------------------------------------
# train_shard_stratified
# --------------------------------------------------------------------------


def test_shards_conserve_and_stratify(spark):
    import duckdb

    out = REGISTRY["train_shard_stratified"].spark(spark, SF_DIR).toPandas()
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert len(out) == 16
    assert out.n_docs.sum() == total
    assert out.stratified_ok.all()
    # round-robin balance: shard sizes differ by at most |sources|
    assert out.n_docs.max() - out.n_docs.min() <= out.n_sources.max()


def test_shards_round_robin_law(spark, tmp_path):
    # one source, 33 docs -> 16 shards of 2 or 3; the heavier shard is
    # whichever md5-rank order fills first, but the SPREAD law is exact.
    rows = [(i, f"doc {i}", "en", "src", 10) for i in range(33)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["train_shard_stratified"]
        .spark(spark, str(tmp_path))
        .toPandas()
    )
    assert out.n_docs.sum() == 33
    assert set(out.n_docs) == {2, 3}
    assert (out.n_docs == 3).sum() == 1  # 33 = 2*16 + 1
    assert out.stratified_ok.all()
    # the +1 shard is shard 0 by round-robin (rank 1..33; rank 33 -> 0)
    assert out.set_index("shard").loc[0, "n_docs"] == 3


def test_shards_assignment_is_md5_deterministic(spark, tmp_path):
    # shard of a known doc: rank within source by (md5(id), id); verify
    # one doc's placement against a python recompute.
    rows = [(i, "t", "en", "s", 1) for i in range(40)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    order = sorted(range(40), key=lambda i: (hashlib.md5(
        str(i).encode()).hexdigest(), i))
    shard_of = {doc: pos % 16 for pos, doc in enumerate(order)}
    # expected per-shard totals from the python assignment
    expect = {}
    for doc, sh in shard_of.items():
        expect[sh] = expect.get(sh, 0) + 1
    out = (
        REGISTRY["train_shard_stratified"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("shard")
    )
    for sh, n in expect.items():
        assert out.loc[sh, "n_docs"] == n
