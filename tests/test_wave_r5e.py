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
