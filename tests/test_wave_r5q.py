"""Semantic laws for the r5q wave: T5-style span corruption."""

from __future__ import annotations

import hashlib

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

BLOCK, SPAN, SAMPLE = 20, 3, 10


def _python_corrupt(doc_id, toks):
    masked, starts = set(), set()
    for i0 in range(len(toks)):
        blk, off = i0 // BLOCK, i0 % BLOCK
        on = hashlib.md5(f"{doc_id}:{blk}".encode()).hexdigest()[0] < "8"
        if on and off < SPAN:
            masked.add(i0)
            if off == 0:
                starts.add(i0)
    corrupted, target = [], []
    for i0, tok in enumerate(toks):
        blk = i0 // BLOCK
        if i0 in starts:
            corrupted.append(f"<X_{blk}>")
            target.extend([f"<X_{blk}>", tok])
        elif i0 in masked:
            target.append(tok)
        else:
            corrupted.append(tok)
    return masked, starts, corrupted, target


def test_span_corruption_matches_python(spark):
    import duckdb

    out = (
        REGISTRY["train_span_corruption"].spark(spark, SF_DIR).toPandas()
        .set_index("doc_id")
    )
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        f"WHERE doc_id % {SAMPLE} = 0"
    ).df()
    checked = 0
    for _, d in docs.iterrows():
        toks = d.text.split(" ")
        if len(toks) < BLOCK:
            continue
        masked, starts, corrupted, target = _python_corrupt(d.doc_id, toks)
        r = out.loc[d.doc_id]
        assert r.n_tok == len(toks)
        assert r.n_spans == len(starts)
        assert r.n_masked == len(masked)
        assert r.corrupted_head == " ".join(corrupted[:15])
        if target:
            assert r.target_head == " ".join(target[:15])
        else:  # no block switched on: target row absent -> NULL
            assert r.target_head is None or r.target_head != r.target_head
        checked += 1
    assert checked == len(out) > 0


def test_span_corruption_invariants(spark):
    out = REGISTRY["train_span_corruption"].spark(spark, SF_DIR).toPandas()
    # spans never overlap: masked = spans * SPAN except a possible
    # truncated final block
    assert (out.n_masked <= out.n_spans * SPAN).all()
    assert (out.n_masked >= (out.n_spans - 1) * SPAN).all()
    # realized corruption rate sits near 3/20 * P(block on) = 7.5%
    overall = out.n_masked.sum() / out.n_tok.sum()
    assert 0.05 < overall < 0.10
    # reconstruction conservation: every token is in exactly one of
    # corrupted (unmasked) or target (masked) -> counts add up
    assert (
        out.n_tok - out.n_masked + out.n_spans >= out.n_spans
    ).all()  # corrupted length = n_tok - n_masked + n_spans
