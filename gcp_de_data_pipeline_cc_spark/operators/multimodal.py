"""Multimodal column plumbing (extension mandate).

Images/audio/video ride through the pipeline as opaque ``binary`` columns
with a typed metadata struct — the lakehouse-standard layout (same shape
as Spark's built-in ``image``/``binaryFile`` sources). Decode and
feature-extraction run as Arrow-batched ``mapInPandas`` stages: the only
part of this engine where Python is the right tool, because codec
libraries are Python/C, not Catalyst.

Decode comes in two rungs. Formats with pure-Python containers — BMP
(BITMAPINFOHEADER, 24-bit uncompressed) and WAV (RIFF PCM) — are decoded
for REAL by :func:`decode_bmp` / :func:`decode_wav`: header parse with
``struct``, pixel/sample extraction honoring row padding and chunk
layout, no external libraries. Compressed codecs (JPEG/MP3/H.264) need
C libraries absent from this container, so :func:`decode_stub` raises
``NotImplementedError`` for those and the pipelines fall back to
:func:`fake_decode_features` — a deterministic byte-level featurizer —
keeping the Spark-side plumbing (schema, batch iteration, partitioning)
fully real and tested either way.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
binary payloads stay off the driver; feature extraction is narrow, so it
pipelines with the scan. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory
against large payloads.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor
FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, checksum long, byte_mean double, "
    "features array<double>"
)


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simulate a multimodal table: payload as ``binary`` + typed metadata
    struct (media_type/n_bytes/sha), as an ingest stage would attach from
    object storage."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        id_col,
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("media_meta"),
    )


def decode_stub(payload: bytes, media_type: str) -> object:
    """Codec router. BMP and WAV decode for real (pure-Python container
    parsers below); compressed codecs (JPEG/MP3/H.264/...) need C
    libraries absent from this container and raise.
    """
    if media_type == "image/bmp":
        return decode_bmp(payload)
    if media_type == "audio/wav":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; "
        "use fake_decode_features for the deterministic test path"
    )


# ---------------------------------------------------------------------------
# real pure-Python containers: 24-bit BMP and PCM WAV
# ---------------------------------------------------------------------------

def synthesize_bmp(seed: bytes, width: int | None = None,
                   height: int | None = None) -> bytes:
    """Deterministically build a VALID 24-bit uncompressed BMP from seed
    bytes (pixels cycle through the seed). Stands in for object-storage
    image payloads so the decode rung can be exercised end-to-end with no
    codec libraries; the output parses in any image viewer.
    """
    if not seed:
        seed = b"\x00"
    w = width if width is not None else 4 + (len(seed) % 5)
    h = height if height is not None else 4 + (seed[0] % 5)
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    pixel_bytes = bytearray()
    i = 0
    for _ in range(h):
        for _ in range(row_raw):
            pixel_bytes.append(seed[i % len(seed)])
            i += 1
        pixel_bytes.extend(b"\x00" * pad)
    data_size = len(pixel_bytes)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + data_size, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return bytes(header + info + pixel_bytes)


def decode_bmp(payload: bytes) -> dict:
    """REAL BMP decode: parse the file + info headers, then walk pixel
    rows honoring the 4-byte row alignment (bottom-up storage order).

    Returns width/height/channels and per-channel means — the shape a
    PIL-backed decoder would feed the featurizer.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _file_size, _, _, offset) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp})"
        )
    abs_h = abs(h)
    row_raw = w * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    sums = [0, 0, 0]  # B, G, R channel order on disk
    n_px = w * abs_h
    for r in range(abs_h):
        row = payload[offset + r * stride : offset + r * stride + row_raw]
        for p in range(0, row_raw, 3):
            sums[0] += row[p]
            sums[1] += row[p + 1]
            sums[2] += row[p + 2]
    return {
        "width": w,
        "height": abs_h,
        "n_channels": 3,
        "mean_b": round(sums[0] / n_px, 6),
        "mean_g": round(sums[1] / n_px, 6),
        "mean_r": round(sums[2] / n_px, 6),
    }


def synthesize_wav(seed: bytes, sample_rate: int = 8000) -> bytes:
    """Deterministically build a VALID RIFF/WAVE file (16-bit PCM mono)
    whose samples derive from the seed bytes (centered, amplified). The
    output plays in any audio player."""
    if not seed:
        seed = b"\x00"
    samples = [((b - 128) * 256) for b in seed]
    data = struct.pack("<%dh" % len(samples), *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> dict:
    """REAL WAV decode: walk the RIFF chunk list, parse the ``fmt ``
    chunk, then unpack the 16-bit PCM frames from ``data``.

    Returns sample-rate/channel/sample-count plus amplitude stats — the
    shape a librosa-backed decoder would feed the featurizer.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt_info, data = None, None
    while pos + 8 <= n:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt_info = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize % 2)  # RIFF chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt_info
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM supported (fmt={audio_fmt}, bits={bits})"
        )
    n_samples = len(data) // 2
    samples = struct.unpack("<%dh" % n_samples, data[: n_samples * 2])
    peak = max((abs(s) for s in samples), default=0)
    mean_amp = (
        round(sum(abs(s) for s in samples) / n_samples, 6) if n_samples else 0.0
    )
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "n_samples": n_samples,
        "peak": peak,
        "mean_amp": mean_amp,
    }


#: unified output schema of the real-decode featurizer (image + audio
#: rows share it; inapplicable fields are null)
DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, "
    "n_channels int, n_samples int, sample_rate int, "
    "feat_mean double, feat_peak double"
)


def attach_media_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simulate a mixed-modality table: even doc_ids carry a real BMP
    image, odd doc_ids a real WAV clip, both synthesized deterministically
    from the document text (Arrow-batched; payloads never touch the
    driver)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, types = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                seed = str(text).encode("utf-8")
                if int(doc_id) % 2 == 0:
                    payloads.append(synthesize_bmp(seed))
                    types.append("image/bmp")
                else:
                    payloads.append(synthesize_wav(seed))
                    types.append("audio/wav")
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads,
                 "media_type": types}
            )

    return docs.select(id_col, text_col).mapInPandas(
        synth, "doc_id long, payload binary, media_type string"
    )


def extract_decoded_features(media: DataFrame) -> DataFrame:
    """REAL decode + featurize over mixed media: route each row by
    media_type through :func:`decode_bmp` / :func:`decode_wav` and emit
    one unified scalar feature row (DECODE_SCHEMA).

    Same Arrow-batched mapInPandas contract as :func:`extract_features`;
    the decode runs on executors, payload bytes never leave the worker.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = bytes(payload)
                d = decode_stub(raw, mtype)
                if mtype == "image/bmp":
                    rows.append(
                        (int(doc_id), mtype, len(raw), d["width"],
                         d["height"], d["n_channels"], None, None,
                         round((d["mean_b"] + d["mean_g"] + d["mean_r"]) / 3, 6),
                         float(max(d["mean_b"], d["mean_g"], d["mean_r"])))
                    )
                else:
                    rows.append(
                        (int(doc_id), mtype, len(raw), None, None,
                         d["n_channels"], d["n_samples"], d["sample_rate"],
                         d["mean_amp"], float(d["peak"]))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "width",
                         "height", "n_channels", "n_samples", "sample_rate",
                         "feat_mean", "feat_peak"],
            )

    return media.mapInPandas(featurize, DECODE_SCHEMA)


def fake_decode_features(payload: bytes, n_dims: int = 4) -> list[float]:
    """Deterministic stand-in for a real feature extractor: bucket byte
    histograms into ``n_dims`` normalized dimensions."""
    if not payload:
        return [0.0] * n_dims
    buckets = [0] * n_dims
    for b in payload:
        buckets[b % n_dims] += 1
    total = float(len(payload))
    # floor-based half-up (cross-engine rounding discipline): shares
    # like 1/128 terminate on a 7th-digit 5 where python round()'s
    # half-even diverges from SQL's floor(x*1e6+0.5)
    return [math.floor(c / total * 1e6 + 0.5) / 1e6 for c in buckets]


def extract_features(
    media: DataFrame, id_col: str = "doc_id", n_dims: int = 4
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives an iterator of pandas batches — constant
    memory regardless of partition size — and yields the typed feature
    frame declared in FEATURE_SCHEMA.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    # Adler-32 (zlib) — position-sensitive AND
                    # closed-form recomputable by an engine that only
                    # sees the bytes (the r6 oracle-pairing upgrade;
                    # crc32's table-driven polynomial was not)
                    "checksum": payloads.map(
                        lambda p: zlib.adler32(bytes(p))
                    ).astype("int64"),
                    # floor-based half-up rounding (the repo's
                    # cross-engine discipline; python round() is
                    # half-even and diverges at .xxxxx5 boundaries)
                    "byte_mean": payloads.map(
                        lambda p: math.floor(
                            sum(bytes(p)) / max(len(p), 1) * 1e6 + 0.5
                        )
                        / 1e6
                    ),
                    "features": payloads.map(
                        lambda p: fake_decode_features(bytes(p), n_dims)
                    ),
                }
            )

    return media.select(id_col, "payload").mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling analog: slice the payload every ``every_n_bytes``
    (as a video pipeline samples every Nth frame), yielding one row per
    sample — the explode-shaped stage of a real multimodal pipeline."""

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_chunk = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, len(raw), every_n_bytes):
                    out_ids.append(doc_id)
                    out_idx.append(i // every_n_bytes)
                    out_chunk.append(
                        hashlib.md5(raw[i : i + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_ids, "sample_idx": out_idx, "chunk_md5": out_chunk}
            )

    return media.select(id_col, "payload").mapInPandas(
        sampler, "doc_id long, sample_idx int, chunk_md5 string"
    )


def ahash64_bmp(payload: bytes) -> int:
    """64-bit AVERAGE-HASH of a decoded BMP — the classic perceptual
    image fingerprint (aHash): grayscale, 8x8 block-mean grid, one bit
    per cell = cell mean above the grid mean.  Near-duplicate images
    differ in a few bits (compare by hamming distance); unrelated
    images behave like random 64-bit words.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _fs, _, _, offset) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr, w, h, _pl, bpp, comp) = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr < 40 or comp != 0 or bpp != 24:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    abs_h = abs(h)
    row_raw = w * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    sums = [0] * 64
    cnts = [0] * 64
    for r in range(abs_h):
        row = payload[offset + r * stride : offset + r * stride + row_raw]
        # BMP stores rows bottom-up when h>0; map storage row -> image row
        # so the hash matches the canonical (top-down) aHash orientation
        ir = abs_h - 1 - r if h > 0 else r
        cr = (ir * 8) // abs_h
        for c in range(w):
            p = c * 3
            gray = row[p] + row[p + 1] + row[p + 2]  # 3x gray, monotone
            cell = cr * 8 + (c * 8) // w
            sums[cell] += gray
            cnts[cell] += 1
    # cell means as exact integer cross-products: m_i = s_i / c_i,
    # grid mean M = (sum m_i)/64; bit_i = m_i > M decided without floats
    num = [s * 64 for s in sums]  # 64 * s_i
    # sum of means with common denominator prod? avoid: compare
    # s_i/c_i > (1/64) * sum_j s_j/c_j  via floats is fine for a
    # fingerprint, but keep it deterministic-integer with a scaled sum:
    means_scaled = [
        (s * 1_000_000) // c if c else 0 for s, c in zip(sums, cnts)
    ]
    grid_mean_scaled = sum(means_scaled) // 64
    bits = 0
    for i, m in enumerate(means_scaled):
        if m > grid_mean_scaled:
            bits |= 1 << i
    return bits


def audio_fp64_wav(payload: bytes, n_frames: int = 16) -> int:
    """64-bit energy-envelope fingerprint of a decoded WAV: the clip
    splits into ``n_frames`` equal frames, each contributing 4 bits of
    peak-normalized mean |amplitude| — a coarse loudness contour that
    survives resampling but distinguishes different audio.
    """
    decode_wav(payload)  # validates RIFF/fmt structure; stats unused here
    # re-extract the samples (decode_wav returns stats only)
    pos, n = 12, len(payload)
    data = b""
    while pos + 8 <= n:
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + csize]
        pos += 8 + csize + (csize % 2)
    n_samples = len(data) // 2
    if n_samples == 0:
        return 0
    samples = struct.unpack("<%dh" % n_samples, data[: n_samples * 2])
    peak = max(max((abs(s) for s in samples), default=0), 1)
    fp = 0
    for f in range(n_frames):
        lo = (f * n_samples) // n_frames
        hi = ((f + 1) * n_samples) // n_frames
        if hi <= lo:
            level = 0
        else:
            acc = sum(abs(s) for s in samples[lo:hi])
            mean = acc // (hi - lo)
            level = min(15, (mean * 16) // peak)
        fp |= level << (4 * f)
    return fp


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """Route each media row to its modality fingerprint — aHash for
    images, energy envelope for audio — in one Arrow-batched pass
    (payload bytes never leave the executors)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = bytes(payload)
                if mtype == "image/bmp":
                    fp = ahash64_bmp(raw)
                elif mtype == "audio/wav":
                    fp = audio_fp64_wav(raw)
                else:
                    raise NotImplementedError(
                        f"no perceptual hash for media_type {mtype!r}"
                    )
                # store as signed int64 (wraps >= 2^63 deterministically)
                if fp >= 1 << 63:
                    fp -= 1 << 64
                rows.append((int(doc_id), mtype, fp))
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "fp64"]
            )

    return media.mapInPandas(run, "doc_id long, media_type string, fp64 long")


# ---------------------------------------------------------------------------
# resize (r6m wave): real decode -> nearest-neighbor resample -> re-encode
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id long, in_width int, in_height int, out_width int, "
    "out_height int, out_n_bytes int, px_checksum long"
)


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor BMP resize: parse the container
    (:func:`decode_bmp`'s header walk), resample the pixel grid at
    src = (out_index * in_dim) // out_dim per axis, and re-encode a
    valid 24-bit BMP (:func:`synthesize_bmp`'s container layout) — the
    thumbnail / vision-preprocessing stage of a multimodal pipeline,
    with no codec library anywhere."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _fs, _, _, offset) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or compression != 0 or bpp != 24:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    if h < 0:
        # top-down row order: resampling in stored order would emit a
        # vertically flipped thumbnail — refuse explicitly (the same
        # contract as the bpp/compression guards) until a caller needs it
        raise NotImplementedError("top-down BMP (negative height) not supported")
    abs_h = abs(h)
    row_raw = w * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    out_raw = out_w * 3
    out_pad = (4 - out_raw % 4) % 4
    out_px = bytearray()
    for r in range(out_h):
        src_r = (r * abs_h) // out_h
        base = offset + src_r * stride
        for c in range(out_w):
            src_c = (c * w) // out_w
            p = base + src_c * 3
            out_px += payload[p:p + 3]
        out_px.extend(b"\x00" * out_pad)
    data_size = len(out_px)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, out_w, out_h, 1, 24, 0, data_size, 2835, 2835,
        0, 0,
    )
    return bytes(header + info + out_px)


def resize_images(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """Arrow-batched resize stage over image payloads: decode, resample,
    re-encode, then RE-DECODE the re-encoded output (roundtrip proof)
    and emit structural evidence — output dims/size and the sum of the
    resized pixel bytes (px_checksum), which an oracle can recompute
    analytically for synthesized payloads. Payload bytes never leave
    the executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image/bmp":
                    continue
                raw = bytes(payload)
                src = decode_bmp(raw)
                out = resize_bmp(raw, out_w, out_h)
                chk = decode_bmp(out)  # roundtrip: re-decode our output
                assert chk["width"] == out_w and chk["height"] == out_h
                # exact integer sum of the resized pixel bytes (row
                # padding is zero bytes, so summing the whole pixel
                # region is safe) — NOT a round-trip through the decoded
                # 6-dp means, which is only exact when out_w*out_h is a
                # power of two
                csum = sum(out[54:])
                rows.append(
                    (int(doc_id), src["width"], src["height"], out_w,
                     out_h, len(out), int(csum))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "in_width", "in_height", "out_width",
                         "out_height", "out_n_bytes", "px_checksum"],
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)
