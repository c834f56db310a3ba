"""Semantic laws for the r4t wave: perceptual image/audio fingerprints."""

from __future__ import annotations

import itertools

from gcp_de_data_pipeline_cc_spark.operators.multimodal import (
    ahash64_bmp,
    audio_fp64_wav,
    synthesize_bmp,
    synthesize_wav,
)
from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_docs(spark, tmp_path, texts, start_id=0, step=2):
    """Even doc_ids -> images; step=2 keeps them all on the image path."""
    rows = [
        (start_id + i * step, t, "en", "s", len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_ahash_deterministic_and_locality():
    base = b"the quick brown fox jumps over the lazy dog " * 4
    h1 = ahash64_bmp(synthesize_bmp(base))
    h2 = ahash64_bmp(synthesize_bmp(base))
    assert h1 == h2  # bit-deterministic
    # a tiny payload edit keeps most blocks' means on the same side
    tweaked = bytearray(base)
    tweaked[10] ^= 0x01
    h3 = ahash64_bmp(synthesize_bmp(bytes(tweaked)))
    assert bin(h1 ^ h3).count("1") <= 16
    # an unrelated payload behaves like a random word
    h4 = ahash64_bmp(synthesize_bmp(b"zzzz completely different content qqqq"))
    assert bin(h1 ^ h4).count("1") >= 10


def test_image_phash_planted_duplicates(spark, tmp_path):
    texts = ["alpha beta gamma delta " * 5] * 2 + [
        "unrelated content number one " * 4,
        "another different document " * 6,
    ]
    _write_docs(spark, tmp_path, texts)
    out = (
        REGISTRY["multimodal_image_phash"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    # identical texts -> identical images -> mutual near-dups
    assert out.loc[0, "ahash64"] == out.loc[2, "ahash64"]
    assert out.loc[0, "n_near_dups"] >= 1 and out.loc[2, "n_near_dups"] >= 1


def test_image_phash_band_candidates_are_complete(spark):
    """Registry-output cross-check: brute-force hamming <= 6 pairs over
    the fixture equals what the banded join reported."""
    out = REGISTRY["multimodal_image_phash"].spark(spark, SF_DIR).toPandas()
    hashes = {
        r.doc_id: int(r.ahash64) & 0xFFFFFFFFFFFFFFFF
        for r in out.itertuples()
    }
    want_partners = {d: 0 for d in hashes}
    for d1, d2 in itertools.combinations(sorted(hashes), 2):
        if bin(hashes[d1] ^ hashes[d2]).count("1") <= 6:
            want_partners[d1] += 1
            want_partners[d2] += 1
    got = dict(zip(out["doc_id"], out["n_near_dups"]))
    assert got == want_partners


def test_audio_fp_deterministic_and_grouping(spark, tmp_path):
    clip = b"pcm seed material for audio synthesis " * 3
    assert audio_fp64_wav(synthesize_wav(clip)) == audio_fp64_wav(
        synthesize_wav(clip)
    )
    texts = ["same audio text " * 4] * 2 + ["different clip " * 7]
    _write_docs(spark, tmp_path, texts, start_id=1, step=2)  # odd ids
    out = (
        REGISTRY["multimodal_audio_fingerprint"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "audio_fp64"] == out.loc[3, "audio_fp64"]
    assert out.loc[1, "group_size"] == 2 and bool(out.loc[1, "is_duplicate"])
    assert out.loc[5, "group_size"] == 1 and not bool(out.loc[5, "is_duplicate"])
