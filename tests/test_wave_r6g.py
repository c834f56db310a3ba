"""Semantic laws for the r6g wave: BPE encode-with-artifact + offline
bandit replay."""

from __future__ import annotations

import datetime
import hashlib

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

MERGES = [
    ("t", "h"), ("th", "e"), ("s", "t"), ("e", "r"),
    ("a", "n"), ("an", "d"), ("o", "r"), ("l", "e"),
]


def _bpe_encode(word):
    toks = list(word)
    for x, y in MERGES:
        out = []
        for t in toks:
            if out and out[-1] == x and t == y:
                out[-1] = x + y
            else:
                out.append(t)
        toks = out
    return toks


# --------------------------------------------------------------------------
# tokenizer_bpe_apply
# --------------------------------------------------------------------------


def test_bpe_apply_matches_python_encoder(spark):
    import duckdb

    texts = duckdb.sql(
        f"SELECT text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    counts, chars, tokens = {}, 0, 0
    for (t,) in texts:
        for w in t.split(" "):
            if not w:
                continue
            chars += len(w)
            enc = _bpe_encode(w)
            tokens += len(enc)
            for tok in enc:
                counts[tok] = counts.get(tok, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    out = REGISTRY["tokenizer_bpe_apply"].spark(spark, SF_DIR).toPandas()
    got = [(r.tok, int(r.n_occurrences)) for _, r in out.iterrows()]
    assert got == top
    assert int(out.corpus_chars.iloc[0]) == chars
    assert int(out.corpus_tokens.iloc[0]) == tokens
    # merging strictly compresses
    assert tokens < chars


def test_bpe_apply_chained_merges(spark, tmp_path):
    # 'the' -> t+h -> th, th+e -> the: a single token; 'stand' ->
    # s+t -> st, a+n -> an, an+d -> and: ['st', 'and']
    rows = [(0, "the the stand", "en", "s", 13)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["tokenizer_bpe_apply"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("tok")
    )
    assert out.loc["the", "n_occurrences"] == 2
    assert out.loc["st", "n_occurrences"] == 1
    assert out.loc["and", "n_occurrences"] == 1
    assert int(out.corpus_tokens.iloc[0]) == 4  # the, the, st, and
    assert int(out.corpus_chars.iloc[0]) == 11


# --------------------------------------------------------------------------
# eval_bandit_replay
# --------------------------------------------------------------------------


def _pi(user):
    h = int(hashlib.md5(f"pi:{user}".encode()).hexdigest()[:2], 16) % 5
    return ["click", "error", "purchase", "signup", "view"][h]


def test_bandit_replay_matches_python(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, event_type,
                   CAST(FLOOR(value*100.0+0.5) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    out = (
        REGISTRY["eval_bandit_replay"].spark(spark, SF_DIR).toPandas()
        .set_index("policy")
    )
    n = len(rows)
    assert (out.n_logged == n).all()
    # logged policy matches everything
    assert out.loc["logged", "n_matched"] == n
    assert out.loc["logged", "match_ppm"] == 1_000_000
    # python replay of the hash policy
    m = [(u, a, r) for u, a, r in rows if _pi(u) == a]
    assert out.loc["hash_personalized", "n_matched"] == len(m)
    assert (
        out.loc["hash_personalized", "mean_reward_cents"]
        == sum(r for _, _, r in m) // len(m)
    )
    # a 5-action near-uniform log: personalized match rate near 1/5
    assert 0.1 < out.loc["hash_personalized", "match_ppm"] / 1e6 < 0.3
    # constant arm matches exactly the purchase share
    n_buy = sum(1 for _, a, _ in rows if a == "purchase")
    assert out.loc["always_purchase", "n_matched"] == n_buy


def test_bandit_replay_planted_best_arm(spark, tmp_path):
    # purchases pay 100x: the constant-purchase policy's replayed mean
    # reward must dominate the logged baseline.
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)
    for u in range(20):
        for i, a in enumerate(
            ["click", "view", "purchase", "signup", "error"]
        ):
            reward = 100.0 if a == "purchase" else 1.0
            rows.append(
                (eid, t0 + datetime.timedelta(minutes=eid), u, a,
                 reward, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = (
        REGISTRY["eval_bandit_replay"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("policy")
    )
    assert out.loc["always_purchase", "mean_reward_cents"] == 10000
    # logged mean: (4*100 + 10000) / 5 = 2080
    assert out.loc["logged", "mean_reward_cents"] == 2080
    assert (
        out.loc["always_purchase", "mean_reward_cents"]
        > out.loc["logged", "mean_reward_cents"]
    )


# --------------------------------------------------------------------------
# hypothesis_mcnemar
# --------------------------------------------------------------------------


def _coin(salt, doc_id, thresh):
    return (
        hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:2] < thresh
    )


def test_mcnemar_matches_python(spark):
    import duckdb

    ids = [
        i for (i,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    b = c = 0
    for i in ids:
        truth = _coin("y", i, "80")
        pa = _coin("ma", i, "66") == truth
        pb = _coin("mb", i, "99") == truth
        if pa and not pb:
            b += 1
        elif pb and not pa:
            c += 1
    out = REGISTRY["hypothesis_mcnemar"].spark(spark, SF_DIR).toPandas()
    r = out.iloc[0]
    assert r.only_a == b and r.only_b == c
    assert r.n == len(ids)
    assert (
        r.n == r.both_ok + r.only_a + r.only_b + r.both_bad
    )
    expect_q = ((abs(b - c) - 1) ** 2 * 1_000_000) // (b + c)
    assert r.chi2_q == expect_q
    assert bool(r.reject_05) == (expect_q > 3_841_459)


def test_mcnemar_zero_discordance_branch(spark, tmp_path):
    # a corpus where both planted models are right/wrong together is
    # impossible to build through the md5 channel, but ONE document
    # with pred_a == pred_b guarantees only_a = only_b = 0 if the two
    # coins agree for that id — pick such an id by search.
    pick = None
    for i in range(2000):
        if _coin("ma", i, "66") == _coin("mb", i, "99"):
            pick = i
            break
    rows = [(pick, "t", "en", "s", 1)]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        REGISTRY["hypothesis_mcnemar"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .iloc[0]
    )
    assert out.only_a == 0 and out.only_b == 0
    assert out.chi2_q == 0
    assert not bool(out.reject_05)
