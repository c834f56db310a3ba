"""Semantic laws for the r5g wave: Krippendorff alpha + randomized
response."""

from __future__ import annotations

import math

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_krippendorff_bounds_and_missingness(spark):
    row = (
        REGISTRY["eval_agreement_krippendorff"].spark(spark, SF_DIR).first()
    )
    # with planted ~12.5/25/19% error rates agreement is real but
    # imperfect: alpha well inside (0, 1)
    assert 0.2 < row.alpha < 0.95, row
    # rater 3 covers ~70%: units carry 2 or 3 ratings, so n_values sits
    # strictly between 2x and 3x the pairable units
    assert 2 * row.n_units < row.n_values < 3 * row.n_units
    assert row.do_scaled > 0 and row.de_pairs > 0


def test_krippendorff_matches_independent_implementation(spark):
    """Differential law: rebuild the three raters' md5-derived ratings
    in plain Python and compute nominal alpha with the TEXTBOOK
    per-pair coincidence formula (float weights 1/(m-1), no DIV
    tricks) — the key's integer-scaled algebra must agree to 1e-9."""
    import hashlib
    from collections import Counter

    from gcp_de_data_pipeline_cc_spark.catalog import load_table

    doc_ids = [
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    ]

    def h(salt, d):
        return hashlib.md5(f"{salt}:{d}".encode()).hexdigest()

    units: dict[int, list[int]] = {}
    for d in doc_ids:
        lbl = int(h("lbl", d)[:8], 16) % 3
        r1 = (lbl + 1) % 3 if h("f1", d)[:2] < "20" else lbl
        r2 = (lbl + 1) % 3 if h("f2", d)[:2] < "40" else lbl
        units[d] = [r1, r2]
        if h("cov", d)[:2] < "b3":
            units[d].append((lbl + 2) % 3 if h("f3", d)[:2] < "30" else lbl)
    # textbook nominal alpha over pairable units
    o: Counter = Counter()
    for labels in units.values():
        m = len(labels)
        if m < 2:
            continue
        for i, c in enumerate(labels):
            for j, k in enumerate(labels):
                if i != j:
                    o[(c, k)] += 1.0 / (m - 1)
    n = sum(o.values())
    n_c = Counter()
    for (c, _k), w in o.items():
        n_c[c] += w
    d_o = sum(w for (c, k), w in o.items() if c != k) / n
    d_e = sum(
        n_c[c] * n_c[k] for c in n_c for k in n_c if c != k
    ) / (n * (n - 1))
    expected = 1.0 - d_o / d_e

    row = (
        REGISTRY["eval_agreement_krippendorff"].spark(spark, SF_DIR).first()
    )
    assert abs(row.alpha - expected) < 1e-5, (row.alpha, expected)


def test_randomized_response_debiasing_within_noise(spark):
    row = (
        REGISTRY["privacy_randomized_response"].spark(spark, SF_DIR).first()
    )
    # the mechanism really flipped ~25%: observed differs from truth
    assert row.observed_yes != row.true_yes
    # unbiased estimator: |error| <= ~4 sigma of the binomial noise,
    # sigma = sqrt(n p (1-p)) / (1 - 2p) with p = 1/4
    sigma = math.sqrt(row.n * 0.25 * 0.75) / 0.5
    assert row.abs_error <= 4 * sigma, (row.abs_error, sigma)
    assert row.epsilon == 1.098612


def test_dataset_fingerprint_laws(spark, tmp_path):
    """Identity laws: order/partitioning-invariant; any single edit
    flips the fingerprint; the ALL row XORs over every source."""
    from gcp_de_data_pipeline_cc_spark.catalog import load_table

    base = REGISTRY["corpus_dataset_fingerprint"].spark(spark, SF_DIR)
    a = {r.source: r.fingerprint for r in base.collect()}

    # a reshuffled copy of the same rows fingerprints identically
    docs = load_table(spark, SF_DIR, "documents")
    docs.orderBy("text").repartition(7).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    b = {
        r.source: r.fingerprint
        for r in REGISTRY["corpus_dataset_fingerprint"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert a == b

    # editing ONE document flips its source's fingerprint and __ALL__,
    # leaving other sources untouched
    from pyspark.sql import functions as F

    victim = docs.orderBy("doc_id").first()
    edited = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == victim.doc_id, F.concat("text", F.lit(" x"))
        ).otherwise(F.col("text")),
    )
    edited.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    c = {
        r.source: r.fingerprint
        for r in REGISTRY["corpus_dataset_fingerprint"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert c["__ALL__"] != a["__ALL__"]
    assert c[victim.source] != a[victim.source]
    for src in a:
        if src not in ("__ALL__", victim.source):
            assert c[src] == a[src]


def test_geohash_matches_reference_encoder(spark):
    """Differential law: the key's integer bit-interleave must produce
    the CANONICAL geohash — re-encode every point with the textbook
    bisection algorithm (the published Niemeyer procedure, float
    midpoints, no bit tricks) and compare all 6 characters."""
    from gcp_de_data_pipeline_cc_spark.catalog import load_table
    from gcp_de_data_pipeline_cc_spark.plans.relational_ext8 import (
        _GH_ALPHA,
    )
    from pyspark.sql import functions as F

    def ref_geohash(lat, lon, length=6):
        lat_iv, lon_iv = [-90.0, 90.0], [-180.0, 180.0]
        bits, code, even = 0, [], True
        ch = 0
        while len(code) < length:
            iv, x = (lon_iv, lon) if even else (lat_iv, lat)
            mid = (iv[0] + iv[1]) / 2
            ch <<= 1
            if x >= mid:
                ch |= 1
                iv[0] = mid
            else:
                iv[1] = mid
            even = not even
            bits += 1
            if bits == 5:
                code.append(_GH_ALPHA[ch])
                bits, ch = 0, 0
        return "".join(code)

    c = load_table(spark, SF_DIR, "customer").limit(200)
    pts = c.select(
        "c_custkey",
        (F.lit(-6000) + (F.col("c_custkey") * 7919 % 12000)).alias("lat_c"),
        (F.lit(-18000) + (F.col("c_custkey") * 104729 % 36000)).alias(
            "lon_c"
        ),
    ).collect()
    # re-run the key's own encode expression over the same points
    from gcp_de_data_pipeline_cc_spark.plans.relational_ext8 import _GH_BITS

    df = spark.createDataFrame(
        [(r.c_custkey, r.lat_c, r.lon_c) for r in pts],
        "c_custkey long, lat_c long, lon_c long",
    ).selectExpr(
        "c_custkey",
        "lat_c",
        "lon_c",
        f"(lat_c + 9000) * {1 << _GH_BITS} DIV 18000 AS latq",
        f"(lon_c + 18000) * {1 << _GH_BITS} DIV 36000 AS lonq",
    ).selectExpr(
        "c_custkey",
        "lat_c",
        "lon_c",
        f"aggregate(sequence(0, {_GH_BITS - 1}), 0L, (acc, i) -> acc"
        f" + shiftleft(shiftright(lonq, {_GH_BITS - 1} - i) % 2, 29 - 2 * i)"
        f" + shiftleft(shiftright(latq, {_GH_BITS - 1} - i) % 2, 28 - 2 * i))"
        " AS g",
    ).selectExpr(
        "c_custkey",
        "lat_c",
        "lon_c",
        " || ".join(
            f"substr('{_GH_ALPHA}', CAST(((g >> {25 - 5 * j}) & 31)"
            f" AS INT) + 1, 1)"
            for j in range(6)
        )
        + " AS geohash6",
    )
    for r in df.collect():
        want = ref_geohash(r.lat_c / 100.0, r.lon_c / 100.0)
        assert r.geohash6 == want, (r.c_custkey, r.geohash6, want)
