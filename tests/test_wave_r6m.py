"""Semantic laws for the r6m wave: real image resize, Fisher's exact
test, the exponential mechanism."""

from __future__ import annotations

import hashlib
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# multimodal_resize
# ---------------------------------------------------------------------------

def _expected_resize(text: str, out_w=8, out_h=8):
    """Independent analytic derivation from the seeding rule alone —
    never calls the operator's decode/encode functions."""
    seed = text.encode("utf-8")
    L = len(seed)
    w = 4 + (L % 5)
    h = 4 + (seed[0] % 5)
    row_raw = w * 3
    csum = 0
    for r in range(out_h):
        src_r = (r * h) // out_h
        for c in range(out_w):
            src_c = (c * w) // out_w
            for ch in range(3):
                csum += seed[(src_r * row_raw + src_c * 3 + ch) % L]
    return w, h, csum


def test_resize_matches_analytic_derivation(spark, tmp_path):
    texts = {
        0: "abcd",
        2: "the quick brown fox jumps over the lazy dog",
        4: "z",
        6: "spark graft resize probe with a longer seed string here",
    }
    rows = [
        (i, t, "en", "s0", len(t)) for i, t in texts.items()
    ] + [(1, "odd doc is audio and must be absent", "en", "s0", 10)]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["multimodal_resize"].spark(spark, str(tmp_path))
        .toPandas().set_index("doc_id")
    )
    assert set(out.index) == set(texts)  # images only, no audio rows
    for did, t in texts.items():
        w, h, csum = _expected_resize(t)
        r = out.loc[did]
        assert (r.in_width, r.in_height) == (w, h)
        assert (r.out_width, r.out_height) == (8, 8)
        assert r.px_checksum == csum
        assert r.out_n_bytes == 54 + 8 * 24  # 8 rows of 24 bytes, pad 0


def test_resize_fixture_invariants(spark):
    out = REGISTRY["multimodal_resize"].spark(spark, SF_DIR).toPandas()
    assert (out.in_width.between(4, 8)).all()
    assert (out.in_height.between(4, 8)).all()
    assert (out.out_width == 8).all() and (out.out_height == 8).all()
    assert (out.out_n_bytes == 246).all()
    assert (out.px_checksum >= 0).all()
    assert (out.px_checksum <= 255 * 192).all()
    assert (out.doc_id % 2 == 0).all()


# ---------------------------------------------------------------------------
# hypothesis_fisher_exact
# ---------------------------------------------------------------------------

def _fisher_p_python(a, r1, c1, n):
    """Two-sided Fisher via math.lgamma — a DIFFERENT lgamma than the
    operator's Stirling series."""

    def lpmf(k):
        return (
            math.lgamma(r1 + 1) - math.lgamma(k + 1)
            - math.lgamma(r1 - k + 1)
            + math.lgamma(n - r1 + 1) - math.lgamma(c1 - k + 1)
            - math.lgamma(n - r1 - c1 + k + 1)
            - math.lgamma(n + 1) + math.lgamma(c1 + 1)
            + math.lgamma(n - c1 + 1)
        )

    p_obs = math.exp(lpmf(a))
    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    return sum(
        math.exp(lpmf(k))
        for k in range(lo, hi + 1)
        if math.exp(lpmf(k)) <= p_obs * (1 + 1e-7)
    )


def test_fisher_matches_python_lgamma(spark):
    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]

    def coin(salt, thresh):
        return {
            i: hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:2] < thresh
            for i in ids
        }

    grp, hit = coin("fg", "80"), coin("fo", "08")
    a = sum(1 for i in ids if grp[i] and hit[i])
    r1 = sum(grp.values())
    c1 = sum(hit.values())
    n = len(ids)
    exp_p = _fisher_p_python(a, r1, c1, n)
    out = REGISTRY["hypothesis_fisher_exact"].spark(spark, SF_DIR).toPandas()
    row = out.iloc[0]
    assert (row.a, row.b, row.c, row.d) == (a, r1 - a, c1 - a,
                                            n - r1 - c1 + a)
    assert 0 < row.p_two_sided <= 1
    assert abs(row.p_two_sided - exp_p) < 2e-6
    if (r1 - a) * (c1 - a) != 0:
        orr = a * (n - r1 - c1 + a) / ((r1 - a) * (c1 - a))
        assert abs(row.odds_ratio - orr) < 1e-3


def test_fisher_extremes_round_to_unit_interval(spark):
    out = REGISTRY["hypothesis_fisher_exact"].spark(spark, SF_DIR).toPandas()
    # the support sum of any hypergeometric is <= 1 by construction
    assert (out.p_two_sided <= 1.000001).all()
    assert (out.p_two_sided >= 0).all()


# ---------------------------------------------------------------------------
# privacy_dp_exponential
# ---------------------------------------------------------------------------

def test_dp_exponential_recomputes_exactly(spark):
    import duckdb

    prices = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_totalprice FROM '{SF_DIR}/orders.parquet'"
        ).fetchall()
    ]
    n = len(prices)
    out = (
        REGISTRY["privacy_dp_exponential"].spark(spark, SF_DIR)
        .toPandas().set_index("candidate")
    )
    assert len(out) == 32
    assert out.is_released.sum() == 1
    best = None
    for j in range(1, 33):
        cand = j * 20000
        rank = sum(1 for p in prices if min(math.ceil(p / 20000), 32) <= j)
        u2 = -abs(2 * rank - n)
        h = hashlib.md5(f"em:{cand}".encode()).hexdigest()[:12]
        u = (int(h, 16) + 0.5) / 281474976710656.0
        g = -math.log(-math.log(u))
        score = math.floor((0.25 * u2 + g) * 1e6 + 0.5) / 1e6
        r = out.loc[cand]
        assert r.rank_below == rank and r.utility2 == u2
        assert abs(r.gumbel - math.floor(g * 1e6 + 0.5) / 1e6) < 1e-12
        assert abs(r.score - score) < 1e-12
        if best is None or (score, -cand) > best[0]:
            best = ((score, -cand), cand)
    assert out.index[out.is_released == 1][0] == best[1]


def test_dp_exponential_utility_peaks_at_median(spark):
    import duckdb

    med = duckdb.sql(
        f"SELECT median(o_totalprice) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    out = REGISTRY["privacy_dp_exponential"].spark(spark, SF_DIR).toPandas()
    top_util = out.loc[out.utility2.idxmax(), "candidate"]
    # the max-utility candidate brackets the true median within one step
    assert abs(top_util - med) <= 20000
