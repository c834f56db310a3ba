"""Semantic tests for the dbt-style declarative test suite
(plans/curation.py: qc_accepted_values / qc_uniqueness / qc_freshness):
each gate must CATCH an injected violation and pass the clean fixture.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _day(i: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=h)


def _write_minimal_warehouse(spark, path, orders_rows, events_rows,
                             lineitem_rows):
    spark.createDataFrame(
        orders_rows,
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        events_rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")
    spark.createDataFrame(
        lineitem_rows,
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


_OK_ORDER = (1, 1, "O", 10.0, _day(0), "1-URGENT")
_OK_EVENT = (1, _day(0), 1, "click", 1.0, "{}")
_OK_LINE = (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _day(1))


def test_accepted_values_catches_injected_bad_status(spark, tmp_path):
    bad_order = (2, 1, "X", 10.0, _day(0), "1-URGENT")
    _write_minimal_warehouse(
        spark, tmp_path, [_OK_ORDER, bad_order], [_OK_EVENT], [_OK_LINE]
    )
    out = {
        r.test: r
        for r in REGISTRY["qc_accepted_values"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    r = out["orders.o_orderstatus"]
    assert not r.passed and r.n_violations == 1 and r.n_bad_values == 1
    assert out["lineitem.l_returnflag"].passed
    assert out["events.event_type"].passed


def test_uniqueness_catches_duplicate_event_id(spark, tmp_path):
    dup = (1, _day(1), 2, "view", 2.0, "{}")  # same event_id as _OK_EVENT
    _write_minimal_warehouse(
        spark, tmp_path, [_OK_ORDER], [_OK_EVENT, dup], [_OK_LINE]
    )
    out = {
        r.test: r
        for r in REGISTRY["qc_uniqueness"].spark(spark, str(tmp_path)).collect()
    }
    r = out["events.event_id"]
    assert not r.passed and r.n_duplicate_rows == 1
    assert out["orders.o_orderkey"].passed
    assert out["lineitem.(l_orderkey,l_linenumber)"].passed


def test_freshness_bands_stale_slices(spark, tmp_path):
    events = [
        (1, _day(10), 1, "click", 1.0, "{}"),     # anchor slice: ok
        (2, _day(9, 10), 1, "view", 1.0, "{}"),   # ~26h behind: warn
        (3, _day(7), 1, "error", 1.0, "{}"),      # 72h behind: error
    ]
    _write_minimal_warehouse(spark, tmp_path, [_OK_ORDER], events, [_OK_LINE])
    out = {
        r.event_type: r
        for r in REGISTRY["qc_freshness"].spark(spark, str(tmp_path)).collect()
    }
    assert out["click"].status == "ok" and out["click"].lag_seconds == 0
    assert out["view"].status == "warn"
    assert out["error"].status == "error"
    assert out["error"].lag_seconds == 72 * 3600


def test_qc_suite_clean_on_fixture(spark):
    av = REGISTRY["qc_accepted_values"].spark(spark, SF_DIR).collect()
    assert all(r.passed for r in av), av
    uq = {r.test: r for r in
          REGISTRY["qc_uniqueness"].spark(spark, SF_DIR).collect()}
    assert uq["orders.o_orderkey"].passed
    assert uq["events.event_id"].passed
    # a REAL catch: the synthetic fixture does not honor TPC-H's
    # (l_orderkey, l_linenumber) uniqueness (1161 duplicated pairs at
    # sf0.001, verified key-by-key) — exactly what this gate exists to
    # surface before MERGE/SCD logic trusts the key
    li = uq["lineitem.(l_orderkey,l_linenumber)"]
    assert not li.passed and li.n_duplicate_rows > 0
    fr = REGISTRY["qc_freshness"].spark(spark, SF_DIR).collect()
    # statuses must agree with the banding law applied to the lags
    for r in fr:
        want = (
            "error"
            if r.lag_seconds > 48 * 3600
            else "warn" if r.lag_seconds > 12 * 3600 else "ok"
        )
        assert r.status == want, r
    assert any(r.status == "ok" for r in fr)


# ---- wave G: concurrency sweep, inter-arrival, coverage curve ----


def _events_only(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_concurrency_counts_overlap_not_volume(spark, tmp_path):
    """Three events inside one 5-minute horizon peak at 3; a
    back-to-back handoff exactly at the horizon boundary stays at 1
    (half-open intervals — the end sorts before the start)."""
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, 1, "burst", 1.0, "{}"),
        (2, t0 + 2 * m, 2, "burst", 1.0, "{}"),
        (3, t0 + 4 * m, 3, "burst", 1.0, "{}"),
        (4, t0, 1, "handoff", 1.0, "{}"),
        (5, t0 + 5 * m, 2, "handoff", 1.0, "{}"),  # starts as #4 ends
    ]
    _events_only(spark, tmp_path, rows)
    out = {
        r.event_type: r.peak_concurrency
        for r in REGISTRY["ts_concurrency"].spark(spark, str(tmp_path)).collect()
    }
    assert out["burst"] == 3
    assert out["handoff"] == 1


def test_interarrival_uniform_series_degenerate_stats(spark, tmp_path):
    """An exactly evenly spaced series has mean = p50 = p90 = the
    spacing, and n_gaps = n-1."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=30 * i), 1, "tick", 1.0, "{}")
        for i in range(10)
    ]
    _events_only(spark, tmp_path, rows)
    r = REGISTRY["ts_interarrival"].spark(spark, str(tmp_path)).first()
    assert r.n_gaps == 9
    assert r.mean_gap_s == r.p50_gap_s == r.p90_gap_s == 30.0
    assert r.max_gap_us == 30_000_000


def test_coverage_curve_monotone_and_exact(spark):
    rows = sorted(
        REGISTRY["vocab_coverage_curve"].spark(spark, SF_DIR).collect(),
        key=lambda r: r.vocab_k,
    )
    assert [r.vocab_k for r in rows] == [5, 10, 20]
    shares = [r.cum_share for r in rows]
    assert shares == sorted(shares) and shares[-1] <= 1.0
    # independent recomputation of the top-5 token mass
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    counts = sorted(((-r["count"], r.t) for r in freq))
    top5 = sum(-c for c, _ in counts[:5])
    assert rows[0].cum_tokens == top5


# ---- wave H: nearest as-of join + lang-ID confusion matrix ----


def test_asof_nearest_picks_closest_and_breaks_ties_earlier(
    spark, tmp_path
):
    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: clicks 2h before and 1h after -> match the after one
        (1, t0 - 2 * h, 1, "click", 1.0, "{}"),
        (2, t0 + 1 * h, 1, "click", 1.0, "{}"),
        (3, t0, 1, "purchase", 5.0, "{}"),
        # user 2: equidistant clicks (3h both sides) -> earlier wins
        (4, t0 - 3 * h, 2, "click", 1.0, "{}"),
        (5, t0 + 3 * h, 2, "click", 1.0, "{}"),
        (6, t0, 2, "purchase", 5.0, "{}"),
        # user 3: nearest click is 30h away -> outside tolerance, none
        (7, t0 + 30 * h, 3, "click", 1.0, "{}"),
        (8, t0, 3, "purchase", 5.0, "{}"),
    ]
    _events_only(spark, tmp_path, rows)
    out = {
        r.purchase_id: r
        for r in REGISTRY["join_asof_nearest"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out[3].click_id == 2 and out[3].direction == "after"
    assert out[3].gap_us == 3600 * 1_000_000
    assert out[6].click_id == 4 and out[6].direction == "before"
    assert out[8].click_id is None and out[8].direction == "none"


def test_lang_confusion_consistent_with_langid(spark):
    cells = REGISTRY["text_lang_confusion"].spark(spark, SF_DIR).collect()
    perdoc = REGISTRY["text_langid"].spark(spark, SF_DIR).collect()
    # cell mass equals classified docs; diagonal mass equals correct docs
    assert sum(c.n_docs for c in cells) == len(perdoc)
    n_correct = sum(1 for r in perdoc if r.is_correct)
    assert sum(c.n_docs for c in cells if c.is_diagonal) == n_correct
    # row shares are row-stochastic (<=5 cells per row, rounded 1e-6)
    from collections import defaultdict

    rows = defaultdict(float)
    for c in cells:
        rows[c.true_lang] += c.row_share
    for lang, s in rows.items():
        assert abs(s - 1.0) < 5e-6, (lang, s)


# ---- kmeans_iterate ----


def test_kmeans_iterate_recovers_separated_blobs(spark, tmp_path):
    """Four well-separated blobs, seeded with one member each (vec_ids
    0-3): two Lloyd iterations must assign every vector to its blob and
    leave tiny inertia."""
    import itertools

    corners = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)]
    rows = []
    vid = 0
    # vec_ids 0..3 are one seed per blob, then 5 more members per blob
    for cx, cy in corners:
        rows.append((vid, [cx, cy], vid))
        vid += 1
    for i, (cx, cy) in itertools.product(range(5), corners):
        jit = 0.1 * (i + 1)
        rows.append((vid, [cx + jit, cy - jit], 0))
        vid += 1
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = REGISTRY["kmeans_iterate"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert all(r.n_vecs == 6 for r in out), out
    assert all(r.inertia < 5.0 for r in out), out


def test_kmeans_iterate_fixture_conservation(spark):
    out = REGISTRY["kmeans_iterate"].spark(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert sum(r.n_vecs for r in out) == emb.count()
    assert all(r.inertia >= 0 for r in out)
    assert len(out) == 4  # no cluster collapsed on this corpus


# ---- corpus_sample_by_weights ----


def test_mix_sample_quota_laws(spark):
    rows = REGISTRY["corpus_sample_by_weights"].spark(spark, SF_DIR).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    budget = int(0.6 * total_docs)
    for r in rows:
        assert r.n_kept == r.n_target <= r.n_docs
        assert r.kept_tokens <= r.n_tokens
    # floor allocation never exceeds the budget
    assert sum(r.n_kept for r in rows) <= budget
    # and lands close to it (floors lose < 1 doc per source)
    assert sum(r.n_kept for r in rows) >= budget - len(rows)
    # temperature 0.5 flattens: the doc-share ratio between the largest
    # and smallest sources shrinks vs their token-share ratio
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    token_ratio = big.n_tokens / small.n_tokens
    quota_ratio = big.n_target / max(small.n_target, 1)
    assert quota_ratio < token_ratio
    # shares are a distribution
    assert abs(sum(r.target_share for r in rows) - 1.0) < len(rows) * 1e-6


# ---- wave J: CDC history + calendar heatmap ----


def test_cdc_history_consistent_with_apply(spark):
    """The interval view and the collapsed view of the SAME CDC feed
    must agree: current history heads == cdc_apply's surviving keys
    (with equal prices), intervals chain without gaps, and deleted keys
    have no current row."""
    hist = REGISTRY["cdc_to_history"].spark(spark, SF_DIR).collect()
    cur = {r.o_orderkey: r for r in
           REGISTRY["cdc_apply"].spark(spark, SF_DIR).collect()}
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in hist:
        by_key[r.o_orderkey].append(r)
    heads = [r for r in hist if r.is_current]
    assert {r.o_orderkey for r in heads} == set(cur)
    for r in heads:
        assert r.price == cur[r.o_orderkey].price
        assert r.valid_to_seq is None
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from_seq)
        # chain: each non-final interval closes at the next open
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to_seq == b.valid_from_seq, k
        # at most one current row; deleted keys have none
        n_cur = sum(1 for r in rows if r.is_current)
        if rows[-1].op == "D":
            assert n_cur == 0, k
        else:
            assert n_cur == 1, k


def test_calendar_heatmap_conserves_and_flags(spark):
    rows = REGISTRY["ts_calendar_heatmap"].spark(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert len(rows) <= 7 * 24
    assert sum(r.n_events for r in rows) == ev.count()
    total_cents = ev.select(
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias("c")
    ).first().c
    assert sum(r.value_cents for r in rows) == total_cents
    for r in rows:
        assert 1 <= r.dow <= 7 and 0 <= r.hour <= 23
        assert r.is_weekend == (r.dow >= 6)


# ---- wave K: surrogate keys + sink reconciliation ----


def test_surrogate_key_separator_prevents_concat_collision(spark, tmp_path):
    """('ab',1) and ('a',11)... the classic: natural keys (12, 3) and
    (1, 23) concat to '123' without a separator — the minted keys must
    differ. Also: a NULL component must not swallow the key."""
    rows = [
        (12, 1, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(1)),
        (1, 1, 1, 23, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(1)),
    ]
    # reuse the lineitem schema writer; orderkey/linenumber carry the case
    _write_minimal_warehouse(spark, tmp_path, [_OK_ORDER], [_OK_EVENT], rows)
    r = REGISTRY["fn_surrogate_key"].spark(spark, str(tmp_path)).first()
    assert r.n_rows == 2 and r.n_keys == 2
    assert r.injective_on_input


def test_surrogate_key_fixture_injective(spark):
    r = REGISTRY["fn_surrogate_key"].spark(spark, SF_DIR).first()
    assert r.injective_on_input
    # the fixture HAS duplicate (orderkey, linenumber) pairs
    # (qc_uniqueness finding) — surrogate keys collapse exactly those
    assert r.n_keys < r.n_rows
    assert len(r.min_key) == 32 and len(r.max_key) == 32


def test_reconcile_sink_all_months_reconciled(spark):
    rows = REGISTRY["qc_reconcile_sink"].spark(spark, SF_DIR).collect()
    assert rows and all(r.reconciled for r in rows)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.src_rows for r in rows) == orders.count()


def test_reconcile_detects_injected_target_corruption(spark, tmp_path):
    """The comparison logic must actually catch a target drift:
    recompute the control totals over a corrupted copy and assert the
    reconciled flag flips for the touched month only."""
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    corrupted = src.withColumn(
        "o_totalprice",
        F.when(F.month("o_orderdate") == 3,
               F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")),
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")

    def totals(df, p):
        return df.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month")
        ).agg(F.sum(cents).alias(f"{p}_cents"))

    j = totals(src, "src").join(totals(corrupted, "tgt"), "month")
    bad = j.filter(F.col("src_cents") != F.col("tgt_cents"))
    good = j.filter(F.col("src_cents") == F.col("tgt_cents"))
    assert bad.count() > 0
    assert good.count() > 0
    assert all(r.month.month == 3 for r in bad.collect())


# ---- text_compression_ratio ----


def test_compression_bands_separate_known_inputs(spark, tmp_path):
    """DEFLATE must put a long repetitive doc in 'boilerplate' and a
    high-entropy doc well above it — the bands the filter promises."""
    import random

    rng = random.Random(7)
    rep = "lorem ipsum dolor " * 300
    noisy = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(8))
        for _ in range(600)
    )
    rows = [(1, rep, "en", "s", len(rep)), (2, noisy, "en", "s", len(noisy))]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
              "n_chars BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: r
        for r in REGISTRY["text_compression_ratio"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out[1].band == "boilerplate" and out[1].ratio < 0.1
    assert out[2].ratio > 0.5
    assert out[2].ratio > out[1].ratio * 5


def test_compression_ratio_deterministic_and_complete(spark):
    a = {r.doc_id: r.deflate_bytes for r in
         REGISTRY["text_compression_ratio"].spark(spark, SF_DIR).collect()}
    b = {r.doc_id: r.deflate_bytes for r in
         REGISTRY["text_compression_ratio"].spark(spark, SF_DIR).collect()}
    assert a == b
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(a) == docs.count()


# ---- ts_active_users ----


def test_active_users_windows_nest_and_age_out(spark, tmp_path):
    """A user active ONLY on day 0 stays in WAU through day 6 and MAU
    through day 27, then ages out; a daily user is in all three."""
    rows = [(1000 + i, _day(i), 1, "click", 1.0, "{}") for i in range(30)]
    rows.append((1, _day(0), 99, "view", 1.0, "{}"))  # one-shot user
    _events_only(spark, tmp_path, rows)
    out = {
        r.day.day - 1: r  # days are 2024-01-(1+i)
        for r in REGISTRY["ts_active_users"].spark(spark, str(tmp_path)).collect()
    }
    assert out[0].dau == 2 and out[0].wau == 2 and out[0].mau == 2
    assert out[6].dau == 1 and out[6].wau == 2  # still inside 7d
    assert out[7].wau == 1  # aged out of WAU
    assert out[27].mau == 2  # last MAU day for the one-shot
    assert out[28].mau == 1  # aged out of MAU
    for r in out.values():
        assert r.dau <= r.wau <= r.mau


def test_active_users_dau_matches_direct_count(spark):
    out = {r.day: r for r in
           REGISTRY["ts_active_users"].spark(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    direct = {
        r.day: r.n
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day")
        ).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(out) == set(direct)
    for day, r in out.items():
        assert r.dau == direct[day]
        assert r.dau <= r.wau <= r.mau


# ---- wave L: corpus novelty + feature overlap ----


def test_novelty_first_doc_is_fully_novel_and_incremental(spark):
    rows = {r.doc_id: r for r in
            REGISTRY["corpus_novelty"].spark(spark, SF_DIR).collect()}
    # the first document by id can only contain novel shingles
    assert rows[min(rows)].novelty == 1.0
    for r in rows.values():
        assert 0 <= r.n_novel <= r.n_shingles
    # global conservation: novel shingles across docs == distinct shingles
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 3
    )
    sh = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.concat_ws(
                    " ", F.col("t")[i - 1], F.col("t")[i], F.col("t")[i + 1]
                ),
            )
        ).alias("s")
    )
    n_distinct = sh.distinct().count()
    assert sum(r.n_novel for r in rows.values()) == n_distinct


def test_feature_overlap_jaccard_laws(spark):
    rows = REGISTRY["feature_overlap_matrix"].spark(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_both <= min(r.n_a, r.n_b)
        assert 0 <= r.user_jaccard <= 1
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sizes = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_a == sizes[r.type_a] and r.n_b == sizes[r.type_b]


# ---- wave M: SLA percentiles + source mirror matrix ----


def test_sla_percentiles_monotone_and_bounded(spark):
    rows = REGISTRY["sla_lag_percentiles"].spark(spark, SF_DIR).collect()
    assert len(rows) == 5
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert sum(r.n_lineitems for r in rows) == li.count()
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.p99_days <= r.max_days
        assert r.p50_days >= 0


def test_source_mirror_matrix_conserves_pairs(spark):
    from gcp_de_data_pipeline_cc_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = REGISTRY["source_mirror_matrix"].spark(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_pairs = ngram_jaccard_pairs(docs, threshold=0.5).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.source_a <= r.source_b
        # the same_source flag must agree with the pair orientation
        if r.same_source:
            assert r.source_a == r.source_b
        else:
            assert r.source_a < r.source_b


# ---- ts_drawdown ----


def test_drawdown_localizes_constructed_trough(spark, tmp_path):
    """Climb 5 days (+10), fall 3 days (-20/day), recover: the trough
    is the last fall day and the depth is exactly 60.00."""
    vals = [10.0] * 5 + [-20.0] * 3 + [15.0] * 4
    rows = [(i, _day(i), 1, "pos", v, "{}") for i, v in enumerate(vals)]
    _events_only(spark, tmp_path, rows)
    r = REGISTRY["ts_drawdown"].spark(spark, str(tmp_path)).first()
    assert r.trough_day.date() == _day(7).date()
    assert r.max_drawdown_cents == 6000
    assert r.max_drawdown == 60.0


def test_drawdown_nonnegative_and_monotone_series_zero(spark, tmp_path):
    rows = [(i, _day(i), 1, "up", 5.0, "{}") for i in range(10)]
    _events_only(spark, tmp_path, rows)
    r = REGISTRY["ts_drawdown"].spark(spark, str(tmp_path)).first()
    # a strictly rising cumulative series never draws down; the
    # earliest-day tie-break pins the (all-zero) argmax to day 0
    assert r.max_drawdown_cents == 0
    assert r.trough_day.date() == _day(0).date()
    fixture = REGISTRY["ts_drawdown"].spark(spark, SF_DIR).collect()
    assert all(r.max_drawdown_cents >= 0 for r in fixture)


# ---- qc_order_total_integrity ----


def test_order_total_integrity_passes_consistent_and_fails_fixture(
    spark, tmp_path
):
    """A constructed warehouse whose header totals DO equal the line
    recomputation scores rate 1.0; the synthetic fixture (independent
    header/line generators) scores 0 — a real standing catch."""
    lines = [
        (1, 1, 1, 1, 1.0, 100.0, 0.1, 0.05, "N", "O", _day(1)),
        (1, 2, 1, 2, 1.0, 50.0, 0.0, 0.0, "N", "O", _day(1)),
        (2, 3, 1, 1, 1.0, 200.0, 0.25, 0.0, "N", "O", _day(1)),
    ]
    # totals = line1: 100*0.9*1.05=94.50 + line2: 50 => 144.50; order2: 150
    orders = [
        (1, 1, "O", 144.50, _day(0), "1-URGENT"),
        (2, 1, "O", 150.00, _day(0), "1-URGENT"),
    ]
    _write_minimal_warehouse(spark, tmp_path, orders, [_OK_EVENT], lines)
    r = REGISTRY["qc_order_total_integrity"].spark(spark, str(tmp_path)).first()
    assert r.n_checked == 2 and r.n_consistent == 2
    assert r.consistency_rate == 1.0 and r.max_abs_diff_cents <= 1

    f = REGISTRY["qc_order_total_integrity"].spark(spark, SF_DIR).first()
    assert f.consistency_rate < 0.01  # the fixture violates the identity
    assert f.n_checked > 0


# ---- user_behavior_entropy ----


def test_behavior_entropy_degenerate_and_uniform_users(spark, tmp_path):
    import math

    rows = []
    # user 1: single behavior -> entropy 0
    for i in range(10):
        rows.append((i, _day(i % 5, i % 24), 1, "click", 1.0, "{}"))
    # user 2: perfectly uniform over 5 types -> entropy ln(5)
    for i, t in enumerate(
        ["click", "view", "purchase", "signup", "error"] * 4
    ):
        rows.append((100 + i, _day(i % 7, i % 24), 2, t, 1.0, "{}"))
    _events_only(spark, tmp_path, rows)
    out = {
        r.user_id: r
        for r in REGISTRY["user_behavior_entropy"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out[1].entropy == 0.0 and out[1].n_types == 1
    assert out[1].dominant_type == "click"
    assert abs(out[2].entropy - round(math.log(5), 4)) < 1e-9
    assert out[2].n_types == 5


def test_behavior_entropy_fixture_bounds(spark):
    import math

    rows = REGISTRY["user_behavior_entropy"].spark(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert len(rows) == ev.select("user_id").distinct().count()
    for r in rows:
        assert 0 <= r.entropy <= round(math.log(r.n_types), 4) + 1e-9


# ---- cohort_ltv_curve ----


def test_ltv_curve_cumulative_and_conservation(spark):
    rows = sorted(
        REGISTRY["cohort_ltv_curve"].spark(spark, SF_DIR).collect(),
        key=lambda r: (r.cohort_week, r.age_weeks),
    )
    assert rows
    from collections import defaultdict

    running = defaultdict(int)
    for r in rows:
        running[r.cohort_week] += r.revenue_cents
        assert r.cum_revenue_cents == running[r.cohort_week]
        assert r.age_weeks >= 0 and r.n_buyers >= 1
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = ev.filter(F.col("event_type") == "purchase").select(
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias("c")
    ).first().c
    assert sum(r.revenue_cents for r in rows) == total


# ---- sli_error_budget ----


def test_sli_burn_math_and_violation_injection(spark, tmp_path):
    """Seven clean days then an all-error day: the trailing rate jumps,
    burn exceeds 1, and the violation flag fires on exactly that day."""
    rows = []
    eid = 0
    for d in range(7):
        for _ in range(4):
            rows.append((eid, _day(d), 1, "click", 1.0, "{}")); eid += 1
    for _ in range(4):
        rows.append((eid, _day(7), 1, "error", 1.0, "{}")); eid += 1
    _events_only(spark, tmp_path, rows)
    out = {r.day.day - 1: r for r in
           REGISTRY["sli_error_budget"].spark(spark, str(tmp_path)).collect()}
    assert all(not out[d].slo_violated for d in range(7))
    r7 = out[7]
    assert r7.day_err_rate == 1.0
    # trailing 7d window covers days 1..7: 4 errors / 28 events
    assert abs(r7.rate_7d - 4 / 28) < 1e-6
    assert not r7.slo_violated  # 0.1428 < 0.25 SLO
    assert abs(r7.budget_burn_7d - (4 / 28) / 0.25) < 1e-3


def test_sli_fixture_consistency(spark):
    rows = REGISTRY["sli_error_budget"].spark(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert sum(r.n_events for r in rows) == ev.count()
    n_err = ev.filter(F.col("event_type") == "error").count()
    assert sum(r.n_errors for r in rows) == n_err
    for r in rows:
        assert r.slo_violated == (r.rate_7d > 0.25) or abs(
            r.rate_7d - 0.25
        ) < 1e-5
