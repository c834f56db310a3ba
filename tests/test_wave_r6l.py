"""Semantic laws for the r6l wave: windowFunnel, mutual information,
Kneser-Ney perplexity."""

from __future__ import annotations

import datetime
import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# seq_funnel_window
# ---------------------------------------------------------------------------

def _write_journeys(spark, tmp_path, journeys):
    """journeys: list of [(event_type, minutes_offset), ...] per user."""
    rows = []
    eid = 0
    d0 = datetime.datetime(2024, 1, 1)
    for uid, steps in enumerate(journeys):
        for et, mins in steps:
            rows.append(
                (eid, d0 + datetime.timedelta(minutes=mins), uid, et,
                 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_funnel_window_planted_journeys(spark, tmp_path):
    journeys = [
        [("view", 0)],                                      # level 1
        [("view", 0), ("click", 30)],                       # level 2
        [("view", 0), ("click", 30), ("purchase", 90)],     # level 3
        [("view", 0), ("click", 500)],                      # click > 6h: 1
        [("purchase", 0)],                                  # no view: 0
        [("click", 0), ("view", 10), ("purchase", 5)],      # early events
        # ^ click BEFORE first view and purchase before any click in the
        #   window -> only the view counts: level 1
    ]
    _write_journeys(spark, tmp_path, journeys)
    out = (
        REGISTRY["seq_funnel_window"].spark(spark, str(tmp_path))
        .toPandas().set_index("level")
    )
    assert out.loc[0, "n_users"] == 1
    assert out.loc[1, "n_users"] == 3
    assert out.loc[2, "n_users"] == 1
    assert out.loc[3, "n_users"] == 1
    assert out.n_users.sum() == len(journeys)


def test_funnel_window_fixture_conservation(spark):
    import duckdb

    out = REGISTRY["seq_funnel_window"].spark(spark, SF_DIR).toPandas()
    n_total = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert out.n_users.sum() == n_total
    assert set(out.level) <= {0, 1, 2, 3}
    # shares recompute from counts
    for _, r in out.iterrows():
        assert abs(
            math.floor(r.n_users / n_total * 1e4 + 0.5) / 1e4 - r.share
        ) < 1e-12
    # the funnel narrows or holds at each deeper level (levels >= 1)
    lv = out.set_index("level").n_users
    # (monotonicity is not a theorem for deepest-step histograms, but
    # level sums ARE: users at level >= k form a shrinking chain)
    ge = {k: sum(v for l, v in lv.items() if l >= k) for k in (1, 2, 3)}
    assert ge[1] >= ge[2] >= ge[3]


# ---------------------------------------------------------------------------
# stats_mutual_info
# ---------------------------------------------------------------------------

def test_mutual_info_matches_python(spark):
    import duckdb

    cells = duckdb.sql(
        f"SELECT lang, source, COUNT(*) FROM '{SF_DIR}/documents.parquet' "
        "GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in cells)
    nx: dict[str, int] = {}
    ny: dict[str, int] = {}
    for x, y, c in cells:
        nx[x] = nx.get(x, 0) + c
        ny[y] = ny.get(y, 0) + c
    exp_pmi = {}
    total_q = 0
    for x, y, c in cells:
        pmi = math.log(c * n / (nx[x] * ny[y]))
        exp_pmi[(x, y)] = math.floor(pmi * 1e6 + 0.5) / 1e6
        total_q += math.floor(c / n * pmi * 1e9 + 0.5)
    exp_mi = math.floor(total_q / 1e9 * 1e6 + 0.5) / 1e6
    out = REGISTRY["stats_mutual_info"].spark(spark, SF_DIR).toPandas()
    assert len(out) == len(cells)
    for _, r in out.iterrows():
        assert abs(r.pmi - exp_pmi[(r.lang, r.source)]) < 1e-12
        assert abs(r.mi_total - exp_mi) < 1e-12


def test_mutual_info_zero_under_independence(spark, tmp_path):
    """A perfectly balanced lang x source grid has MI exactly 0 and
    every cell PMI exactly 0."""
    rows = []
    did = 0
    for lang in ("en", "de"):
        for src in ("s0", "s1", "s2"):
            for _ in range(5):
                rows.append((did, "w w", lang, src, 3))
                did += 1
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = REGISTRY["stats_mutual_info"].spark(spark, str(tmp_path)).toPandas()
    assert (out.pmi == 0).all()
    assert (out.mi_total == 0).all()


def test_mutual_info_perfect_leakage_equals_entropy(spark, tmp_path):
    """When source determines lang exactly, MI = H(lang)."""
    rows = []
    did = 0
    for lang, src, k in (("en", "s0", 6), ("de", "s1", 3), ("fr", "s2", 1)):
        for _ in range(k):
            rows.append((did, "w w", lang, src, 3))
            did += 1
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = REGISTRY["stats_mutual_info"].spark(spark, str(tmp_path)).toPandas()
    n = 10
    h = -sum(k / n * math.log(k / n) for k in (6, 3, 1))
    assert abs(out.mi_total.iloc[0] - h) < 1e-4


# ---------------------------------------------------------------------------
# text_kneser_ney
# ---------------------------------------------------------------------------

def _kn_bits_python(docs, d=0.75):
    """Exact replication of the operator's model + quantization."""
    pos = []
    for doc_id, text in docs:
        t = text.split(" ")
        for i in range(len(t) - 1):
            pos.append((doc_id, t[i], t[i + 1]))
    bt: dict[tuple, int] = {}
    for _, c, w in pos:
        bt[(c, w)] = bt.get((c, w), 0) + 1
    c1: dict[str, int] = {}
    n1fw: dict[str, int] = {}
    n1bw: dict[str, int] = {}
    for (c, w), k in bt.items():
        c1[c] = c1.get(c, 0) + k
        n1fw[c] = n1fw.get(c, 0) + 1
        n1bw[w] = n1bw.get(w, 0) + 1
    nbb = len(bt)
    agg: dict[int, list] = {}
    for doc_id, c, w in pos:
        p = (bt[(c, w)] - d) / c1[c] + d * n1fw[c] / c1[c] * (
            n1bw[w] / nbb
        )
        bq = math.floor(-math.log2(p) * 1e6 + 0.5)
        agg.setdefault(doc_id, []).append(bq)
    return {
        k: math.floor(sum(v) / len(v) / 1e6 * 1e4 + 0.5) / 1e4
        for k, v in agg.items()
    }


def test_kneser_ney_matches_python(spark, tmp_path):
    docs = [
        (0, "a b a b a c"),
        (1, "a b c d a b"),
        (2, "d d d a b"),
        (3, "c a c a c a"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in docs],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    exp = _kn_bits_python(docs)
    out = (
        REGISTRY["text_kneser_ney"].spark(spark, str(tmp_path))
        .toPandas().set_index("doc_id")
    )
    assert len(out) == len(exp)
    for did, bits in exp.items():
        assert abs(out.loc[did, "bits_per_bigram"] - bits) < 1e-9
        assert abs(
            out.loc[did, "perplexity"] - 2 ** out.loc[did, "bits_per_bigram"]
        ) < 1e-9


def test_kneser_ney_probabilities_sum_to_one(spark):
    """Interpolated KN is a proper conditional distribution: for every
    context, discounted seen mass + backoff weight x 1 == 1 given the
    operator's count definitions (c1 = sum of c2, sum of p_cont = 1).
    Verified numerically on the real fixture's model."""
    import duckdb

    bt = duckdb.sql(
        f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM '{SF_DIR}/documents.parquet'),
        pos AS (
            SELECT UNNEST(list_transform(range(1, len(t)), i -> t[i]))
                       AS ctx,
                   UNNEST(list_transform(range(1, len(t)), i -> t[i+1]))
                       AS w2
            FROM base WHERE len(t) >= 2)
        SELECT ctx, w2, COUNT(*) FROM pos GROUP BY 1, 2
        """
    ).fetchall()
    c1: dict[str, int] = {}
    n1fw: dict[str, int] = {}
    n1bw: dict[str, int] = {}
    for c, w, k in bt:
        c1[c] = c1.get(c, 0) + k
        n1fw[c] = n1fw.get(c, 0) + 1
        n1bw[w] = n1bw.get(w, 0) + 1
    nbb = len(bt)
    assert sum(n1bw.values()) == nbb  # sum of p_cont == 1 exactly
    d = 0.75
    by_ctx: dict[str, float] = {}
    seen_cont: dict[str, int] = {}
    for c, w, k in bt:
        by_ctx[c] = by_ctx.get(c, 0.0) + (k - d) / c1[c] + d * n1fw[
            c
        ] / c1[c] * (n1bw[w] / nbb)
        seen_cont[c] = seen_cont.get(c, 0) + n1bw[w]
    # seen mass + backoff mass routed to UNSEEN continuations == 1
    for c, seen in by_ctx.items():
        unseen = d * n1fw[c] / c1[c] * ((nbb - seen_cont[c]) / nbb)
        assert abs(seen + unseen - 1.0) < 1e-9


def test_kneser_ney_same_support_as_bigram_lm(spark):
    """Rung-to-rung comparability: KN scores exactly the documents the
    add-one rung scores (same >=2-token support), and both emit
    positive bits."""
    kn = REGISTRY["text_kneser_ney"].spark(spark, SF_DIR).toPandas()
    a1 = REGISTRY["text_bigram_lm"].spark(spark, SF_DIR).toPandas()
    assert set(kn.doc_id) == set(a1.doc_id)
    assert (kn.bits_per_bigram > 0).all()
    m = kn.set_index("doc_id").join(
        a1.set_index("doc_id"), lsuffix="_kn", rsuffix="_a1"
    )
    assert (m.n_bigrams_kn == m.n_bigrams_a1).all()
