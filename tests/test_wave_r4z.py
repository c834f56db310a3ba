"""Semantic laws for the r4z wave: high-watermark ingest + ROUGE-L LCS."""

from __future__ import annotations

import datetime

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# incremental_watermark_ingest
# --------------------------------------------------------------------------


def test_watermark_ingest_exactly_once_and_batches(spark):
    out = REGISTRY["incremental_watermark_ingest"].spark(spark, SF_DIR).toPandas()
    # exactly-once: every day appears once, under exactly one batch
    assert out.day.is_unique
    assert set(out.batch_id) <= {1, 2, 3}
    d0 = out.day.min()
    for _, r in out.iterrows():
        off = (r.day - d0).days
        expect = 1 if off <= 9 else (2 if off <= 19 else 3)
        assert r.batch_id == expect
    # watermark is the max loaded day, identical on every row
    assert (out.watermark_day == out.day.max()).all()
    # per-day counts reconcile with the source feed
    import duckdb

    src = duckdb.sql(
        f"SELECT CAST(ts AS DATE) d, COUNT(*) n FROM "
        f"'{SF_DIR}/events.parquet' GROUP BY 1"
    ).df()
    src["d"] = src.d.map(lambda x: x.date() if hasattr(x, "date") else x)
    merged = out.merge(src, left_on="day", right_on="d")
    assert len(merged) == len(out) == len(src)
    assert (merged.n_events == merged.n).all()


def test_watermark_ingest_synthetic_boundaries(spark, tmp_path):
    rows = []
    day0 = datetime.datetime(2024, 5, 1, 8, 0, 0)
    for i in range(25):
        for j in range(i % 3 + 1):
            rows.append(
                (
                    i * 10 + j,
                    j,
                    "view",
                    day0 + datetime.timedelta(days=i),
                    1.0,
                    "s",
                )
            )
    spark.createDataFrame(
        rows,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE, session_id STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["incremental_watermark_ingest"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert len(out) == 25
    assert list(out.batch_id[:10]) == [1] * 10
    assert list(out.batch_id[10:20]) == [2] * 10
    assert list(out.batch_id[20:]) == [3] * 5
    assert int(out.n_events.sum()) == len(rows)


# --------------------------------------------------------------------------
# eval_rouge_l
# --------------------------------------------------------------------------

CAP, SAMPLE = 32, 20


def _channel(r):
    out = []
    n = len(r)
    for i in range(1, n + 1):
        if i % 5 == 0:
            out.append("qz")
        elif i % 2 == 1:
            out.append(r[i] if i + 1 <= n else r[i - 1])
        else:
            out.append(r[i - 2])
    return out


def _lcs(a, b):
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if a[i - 1] == b[j - 1]:
                dp[i][j] = dp[i - 1][j - 1] + 1
            else:
                dp[i][j] = max(dp[i - 1][j], dp[i][j - 1])
    return dp[n][m]


def test_rouge_matches_python_dp_exactly(spark):
    import duckdb

    out = (
        REGISTRY["eval_rouge_l"].spark(spark, SF_DIR).toPandas()
        .set_index("doc_id")
    )
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        f"WHERE doc_id % {SAMPLE} = 0"
    ).df()
    checked = 0
    for _, drow in docs.iterrows():
        toks = drow.text.split(" ")
        if len(toks) < 4:
            continue
        r = toks[:CAP]
        lcs = _lcs(_channel(r), r)
        assert out.loc[drow.doc_id, "lcs"] == lcs
        assert out.loc[drow.doc_id, "n_tok"] == len(r)
        checked += 1
    assert checked == len(out) > 0


def test_rouge_channel_bounds(spark):
    out = REGISTRY["eval_rouge_l"].spark(spark, SF_DIR).toPandas()
    # every swapped pair keeps at least one of its two tokens in order,
    # so lcs >= floor((n - #subs)/2); and lcs < n once a sub exists
    # ('qz' is not in the synthetic vocabulary)
    for _, r in out.iterrows():
        subs = r.n_tok // 5
        assert r.lcs >= (r.n_tok - subs) // 2
        if subs:
            assert r.lcs < r.n_tok
        assert abs(r.rouge_l - round(r.lcs / r.n_tok, 6)) < 2e-6


def test_rouge_identity_on_repeated_tokens(spark, tmp_path):
    # all-identical tokens: swaps are no-ops, only the 'qz' subs cut in;
    # LCS = n - n//5 exactly
    texts = [("tok " * 10).strip(), ("tok " * 4).strip()]
    rows = [(i * SAMPLE, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["eval_rouge_l"].spark(spark, str(tmp_path)).toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "lcs"] == 10 - 2
    assert out.loc[SAMPLE, "lcs"] == 4  # n=4: no sub position
    assert out.loc[SAMPLE, "rouge_l"] == 1.0
