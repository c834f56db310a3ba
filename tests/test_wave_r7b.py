"""Semantic laws for the round-7 operator wave (stats, time-series,
corpus-curation, retrieval extensions)."""

from __future__ import annotations

import numpy as np

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from gcp_de_data_pipeline_cc_spark.plans.stats4 import _merge_count
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# hypothesis_kendall_knight
# ---------------------------------------------------------------------------

def test_merge_count_matches_brute_force():
    rng = np.random.default_rng(3)
    for n in (1, 2, 7, 100, 513):
        a = rng.integers(0, 50, size=n)
        brute = sum(
            1 for i in range(n) for j in range(i + 1, n) if a[i] > a[j]
        )
        assert _merge_count(a) == brute


def test_kendall_knight_matches_pair_formula(spark):
    """The decomposed inversion count must equal the O(n²) identity
    P+Q+tx+ty+txy = n(n-1)/2 and produce tau in [-1, 1]."""
    out = (
        REGISTRY["hypothesis_kendall_knight"].spark(spark, SF_DIR)
        .toPandas().iloc[0]
    )
    n = out.n
    total = out.concordant + out.discordant + out.ties_x + out.ties_y
    # txy = n0 - (P + Q + tx + ty)
    assert total <= n * (n - 1) // 2
    assert -1.0 <= out.tau_b <= 1.0


# ---------------------------------------------------------------------------
# stats wave
# ---------------------------------------------------------------------------

def test_wilcoxon_rank_sums_partition(spark):
    """W+ + W- must equal n(n+1)/2 (every nonzero pair is ranked)."""
    out = (
        REGISTRY["stats_wilcoxon_signed_rank"].spark(spark, SF_DIR)
        .toPandas().iloc[0]
    )
    n = out.n_pairs
    assert abs((out.w_plus + out.w_minus) - n * (n + 1) / 2) < 1e-6


def test_runs_test_counts_consistent(spark):
    out = REGISTRY["stats_runs_test"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert 1 <= out.n_runs <= out.n_above + out.n_below
    # the lower-median cut keeps the split near-even
    assert abs(out.n_above - out.n_below) <= out.n_above + out.n_below


def test_friedman_rank_mass_conserved(spark):
    """With k=5 treatments each block contributes rank mass 15, so
    Q >= 0 always and Q = 0 iff all rank sums equal."""
    out = REGISTRY["stats_friedman"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert out.k == 5
    assert out.q_stat >= 0
    assert out.n_blocks >= 1


# ---------------------------------------------------------------------------
# time-series wave
# ---------------------------------------------------------------------------

def test_hurst_in_unit_interval(spark):
    out = REGISTRY["ts_hurst_rs"].spark(spark, SF_DIR).toPandas().iloc[0]
    # R/S averages grow with scale for any real series
    assert out.rs8 < out.rs16 < out.rs32 < out.rs64
    assert 0.0 < out.hurst < 1.2  # estimator can mildly overshoot 1


def test_sample_entropy_a_subset_of_b(spark):
    out = (
        REGISTRY["ts_sample_entropy"].spark(spark, SF_DIR).toPandas().iloc[0]
    )
    assert out.a_cnt <= out.b_cnt  # 3-matches are a subset of 2-matches
    if out.a_cnt > 0:
        assert out.sampen >= 0


def test_pacf_lag1_equals_acf1(spark):
    """phi_11 IS the lag-1 autocorrelation by construction."""
    pacf = (
        REGISTRY["ts_pacf_durbin"].spark(spark, SF_DIR)
        .toPandas().set_index("event_type")
    )
    acf = (
        REGISTRY["ts_autocorr"].spark(spark, SF_DIR)
        .toPandas().set_index("event_type")
    )
    for et in pacf.index:
        assert abs(pacf.loc[et, "pacf1"] - acf.loc[et, "acf1"]) <= 1e-3
    assert ((pacf.pacf2.abs() <= 1.0) & (pacf.pacf3.abs() <= 1.5)).all()


# ---------------------------------------------------------------------------
# corpus wave
# ---------------------------------------------------------------------------

def test_dsir_target_scores_highest(spark):
    """The target domain must have the highest mean importance weight
    — DSIR's defining property (a doc from the target distribution
    looks maximally target-like)."""
    out = (
        REGISTRY["corpus_dsir_weights"].spark(spark, SF_DIR)
        .toPandas().set_index("source")
    )
    assert out.mean_logw.idxmax() == "src0"
    assert out.loc["src0", "n_positive"] >= out.n_positive.median()


def test_perplexity_buckets_are_terciles(spark):
    out = REGISTRY["corpus_perplexity_buckets"].spark(spark, SF_DIR).toPandas()
    by_bucket = out.groupby("bucket").n_docs.sum()
    total = by_bucket.sum()
    # tercile cut: bucket sizes within 1 of each other
    assert by_bucket.max() - by_bucket.min() <= 1
    assert set(out.bucket) == {"head", "middle", "tail"}
    # head has the lowest perplexity by construction
    m = out.groupby("bucket").apply(
        lambda g: (g.avg_bits * g.n_docs).sum() / g.n_docs.sum(),
        include_groups=False,
    )
    assert m["head"] < m["middle"] < m["tail"]
    assert total == 500


def test_distinct_ngrams_bounds(spark):
    out = REGISTRY["text_distinct_ngrams"].spark(spark, SF_DIR).toPandas()
    assert (out.distinct1 <= out.n_tokens).all()
    assert (out.distinct1_ratio <= 1.0).all()
    assert (out.distinct2_ratio <= 1.0).all()
    # bigram types are at least as diverse as unigram types in prose
    assert (out.distinct2_ratio >= out.distinct1_ratio - 1e-9).mean() > 0.9


# ---------------------------------------------------------------------------
# retrieval wave
# ---------------------------------------------------------------------------

def test_query_likelihood_ranks_term_rich_docs(spark):
    out = (
        REGISTRY["retrieval_query_likelihood"].spark(spark, SF_DIR)
        .toPandas()
    )
    assert len(out) == 20
    assert (out["rank"] == range(1, 21)).all()
    # scores are log-probabilities: strictly negative, rank-descending
    assert (out.ql_score < 0).all()
    assert (out.ql_score.diff().dropna() <= 1e-9).all()


def test_chrf_beats_random_and_below_perfect(spark):
    out = REGISTRY["eval_chrf"].spark(spark, SF_DIR).toPandas().iloc[0]
    # the noisy channel keeps 4/5 tokens: chrF well above 0.5,
    # strictly below 1
    assert 0.5 < out.chrf < 1.0
    assert out.hits2 <= out.cand2_total
    assert out.f3gram <= out.f2gram  # longer grams are harder


# ---------------------------------------------------------------------------
# documented swaps delivered (r7 second session)
# ---------------------------------------------------------------------------

def test_periodogram_fft_equals_direct(spark):
    """The FFT swap must reproduce the relational DFT's rounded
    spectrum exactly (shared-oracle twins — the Tarjan discipline)."""
    fft = (
        REGISTRY["ts_periodogram_fft"].spark(spark, SF_DIR)
        .toPandas().set_index(["event_type", "k"]).sort_index()
    )
    direct = (
        REGISTRY["ts_periodogram"].spark(spark, SF_DIR)
        .toPandas().set_index(["event_type", "k"]).sort_index()
    )
    assert (fft.power == direct.power).all()
    assert (fft.is_dominant == direct.is_dominant).all()


def test_shapley_sampled_efficiency_telescopes(spark):
    """For ANY permutation set the sampled estimator telescopes:
    sum_c phi_hat_c = v(full) - v(empty) EXACTLY."""
    out = (
        REGISTRY["attribution_shapley_sampled"].spark(spark, SF_DIR)
        .toPandas()
    )
    m = 8
    assert out.sampled_8ths.sum() == m * out.attributable_conversions.iloc[0]
    # the exact arm obeys the same identity in 24ths
    assert out.exact_24ths.sum() == 24 * out.attributable_conversions.iloc[0]


# ---------------------------------------------------------------------------
# wave 3: experiment guard, AA links, fair share, capture-recapture
# ---------------------------------------------------------------------------

def test_srm_passes_on_hash_assignment(spark):
    """The md5 arm hash is unbiased by construction: no SRM on real
    data, ratio near 0.5."""
    out = REGISTRY["ab_srm_check"].spark(spark, SF_DIR).toPandas().iloc[0]
    assert not out.srm_flag
    assert 0.3 < out.ratio_a < 0.7
    assert out.n_a + out.n_b > 0


def test_adamic_adar_ranks_subset_of_jaccard_candidates(spark):
    """AA and Jaccard score the same non-adjacent wedge candidates —
    every AA pair must appear in the link-prediction candidate
    universe (common >= 1, non-adjacent) and scores are positive."""
    aa = REGISTRY["graph_adamic_adar"].spark(spark, SF_DIR).toPandas()
    assert (aa.common >= 1).all()
    assert (aa.adamic_adar > 0).all()
    # deg(z) >= 2 for any common neighbor -> each wedge contributes
    # at most 1/ln(2): score bounded by common / ln(2)
    assert (aa.adamic_adar <= aa.common / 0.6931 + 1e-6).all()


def test_fair_share_water_filling_properties(spark):
    out = (
        REGISTRY["ops_fair_share_allocation"].spark(spark, SF_DIR)
        .toPandas()
    )
    demand = out.demand_cents / 100.0
    # uncapped tenants receive exactly their demand
    un = out[~out.capped]
    assert (abs(un.allocation - demand[~out.capped]) <= 0.011).all()
    # capped tenants all receive the same water level, below demand
    cap = out[out.capped]
    if len(cap) > 0:
        assert cap.allocation.max() - cap.allocation.min() <= 0.011
        assert (cap.allocation <= demand[out.capped] + 0.011).all()
    # capacity is spent exactly: sum(alloc) == floor(sum(d)/2)/100
    assert abs(out.allocation.sum() - (out.demand_cents.sum() // 2) / 100.0) \
        <= 0.01 * len(out)


def test_capture_recapture_estimate_bounds(spark):
    out = (
        REGISTRY["stats_capture_recapture"].spark(spark, SF_DIR)
        .toPandas().iloc[0]
    )
    assert out.n_both >= 1  # the two detectors must overlap on junk
    # Chapman is at least the union and at most n_a * n_b
    assert out.chapman_estimate >= out.n_a + out.n_b - out.n_both - 1
    assert out.chapman_estimate <= out.n_a * out.n_b
    assert 0 < out.coverage_a <= 1.0 and 0 < out.coverage_b <= 1.0


# ---------------------------------------------------------------------------
# wave 4: Theil decomposition, bridges, DP top-k
# ---------------------------------------------------------------------------

def test_theil_decomposition_identity(spark):
    """T_total = T_between + sum(share_g * T_within_g) — the
    decomposability Gini lacks, exact to the quantization grain."""
    out = REGISTRY["agg_theil_decomposition"].spark(spark, SF_DIR).toPandas()
    t_total = out.t_total.iloc[0]
    t_between = out.t_between.iloc[0]
    within_mix = (out.income_share * out.t_within).sum()
    assert abs(t_total - (t_between + within_mix)) < 1e-4
    assert t_total >= 0 and t_between >= 0
    assert (out.t_within >= -1e-9).all()


def test_bridges_match_component_arithmetic(spark):
    out = REGISTRY["graph_bridges_tarjan"].spark(spark, SF_DIR).toPandas()
    # deleting a bridge splits exactly one component in two
    assert (
        out.comp_without == out.comp_full + out.is_bridge
    ).all()
    assert set(out.is_bridge) <= {0, 1}


def test_dp_topk_release_shape(spark):
    out = REGISTRY["privacy_dp_topk"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 5
    assert (out["rank"] == range(1, 6)).all()
    # noisy counts are rank-descending and the release column exists
    assert (out.noisy_count.diff().dropna() <= 1e-9).all()
    assert "true_count" not in out.columns  # the privacy boundary


# ---------------------------------------------------------------------------
# wave 5: Heaps' law, MCC
# ---------------------------------------------------------------------------

def test_heaps_vocab_growth_concave(spark):
    out = REGISTRY["corpus_heaps_law"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 10
    # vocabulary and token counts both grow monotonically
    assert (out.n_tokens.diff().dropna() > 0).all()
    assert (out.vocab.diff().dropna() >= 0).all()
    # the synthetic corpus has a CLOSED ~31-token vocabulary, so the
    # correct readout is beta ~= 0 (saturation) — the diagnostic doing
    # its job; natural-language behaviour is pinned on the planted
    # fixture below
    beta = out.heaps_beta.iloc[0]
    assert 0.0 <= beta < 1.0
    assert (out.vocab <= out.n_tokens).all()


def test_heaps_beta_positive_on_growing_vocabulary(spark, tmp_path):
    """A corpus whose every doc coins sqrt-many new tokens must show
    0 < beta < 1 — the open-vocabulary regime Heaps' law describes."""
    rows = []
    tok_id = 0
    for d in range(100):
        # coin a new token only when floor(sqrt(d)) increments →
        # vocab(d) ~ sqrt(d) while tokens grow linearly: beta ~ 0.5
        n_new = int((d + 1) ** 0.5) - int(d**0.5)
        words = [f"w{tok_id + i}" for i in range(n_new)]
        tok_id += n_new
        words += [f"w{(d * 7) % max(tok_id, 1)}" for _ in range(20)]
        rows.append((d, " ".join(words), "src0", "en"))
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, source STRING, lang STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = REGISTRY["corpus_heaps_law"].spark(spark, str(tmp_path)).toPandas()
    beta = out.heaps_beta.iloc[0]
    assert 0.05 < beta < 1.0, out.to_string()


def test_mcc_agrees_with_confusion_matrix(spark):
    import math

    out = REGISTRY["eval_mcc"].spark(spark, SF_DIR).toPandas().iloc[0]
    tp, fp, fn, tn = out.tp, out.fp, out.fn, out.tn
    want = (tp * tn - fp * fn) / math.sqrt(
        float((tp + fp) * (tp + fn)) * float((tn + fp) * (tn + fn))
    )
    assert abs(out.mcc - want) < 1e-5
    # ~6% label flips on an imbalanced task: MCC well above chance,
    # below perfect, and BELOW accuracy (the imbalance gap)
    assert 0.5 < out.mcc < 1.0
    assert out.mcc < out.accuracy
