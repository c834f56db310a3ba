"""Semantic laws for the r3g sketch wave: Count-Min, portable Bloom,
and the MinHash-vs-exact dedup accuracy eval."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# -------------------------------------------------------------- count-min

def test_countmin_never_underestimates_on_fixture(spark):
    out = REGISTRY["sketch_countmin"].spark(spark, SF_DIR).collect()
    assert len(out) == 25
    for r in out:
        assert r.est_n >= r.exact_n  # the CMS guarantee
        assert r.overcount == r.est_n - r.exact_n
    # audited tokens are the true heavy hitters, descending
    counts = [r.exact_n for r in out]
    assert counts == sorted(counts, reverse=True)


def test_countmin_single_token_corpus_exact(spark, tmp_path):
    # one distinct token -> no colliding mass -> est == exact
    _write_docs(spark, tmp_path,
                [(i, "solo solo solo", "en", "s", 14) for i in range(4)])
    out = REGISTRY["sketch_countmin"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.token == "solo" and r.exact_n == 12
    assert r.est_n == 12 and r.overcount == 0


# ------------------------------------------------------------------ bloom

def test_bloom_no_false_negatives_and_counts_conserve(spark):
    r = REGISTRY["sketch_bloom"].spark(spark, SF_DIR).collect()[0]
    assert r.n_false_neg == 0  # structural Bloom guarantee
    assert r.n_true_pos == r.n_keys  # every active customer probed + found
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert r.n_probes == n_cust
    assert 0 <= r.n_bits_set <= 4 * r.n_keys
    # fpr consistent with the counts (floor-form rounding at 1e-6)
    non_members = r.n_probes - r.n_keys
    if non_members:
        import math
        expect = math.floor(r.n_false_pos / non_members * 1e6 + 0.5) / 1e6
        assert r.fpr == expect
        # at sf0.01/sf0.1 load factors the FPR stays in single digits %
        assert r.fpr <= 0.1


# ----------------------------------------------------------- dedup eval

def test_dedup_eval_precision_one_recall_bounded(spark):
    r = REGISTRY["dedup_accuracy_eval"].spark(spark, SF_DIR).collect()[0]
    # LSH verifies candidates with the exact Jaccard -> subset of exact
    assert r.n_common == r.n_minhash
    assert r.precision == 1.0
    assert r.n_exact >= r.n_minhash
    assert 0.0 <= r.recall <= 1.0
    # 32 perms / 8 bands at threshold 0.5 sits far up the S-curve
    assert r.recall >= 0.9
    assert r.f1 >= r.recall * 2 / (1 + r.recall) - 1e-9


def test_dedup_eval_clone_corpus_perfect_scores(spark, tmp_path):
    base = [
        (i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}",
         "en", "s", 40)
        for i in range(5)
    ]
    clones = [(100 + i, t, l, s, n) for i, t, l, s, n in base]
    _write_docs(spark, tmp_path, base + clones)
    r = REGISTRY["dedup_accuracy_eval"].spark(spark, str(tmp_path)).collect()[0]
    # each doc pairs exactly with its clone; identical docs share every
    # signature, so LSH recovers all 5 pairs
    assert r.n_exact == 5 and r.n_minhash == 5 and r.n_common == 5
    assert r.precision == 1.0 and r.recall == 1.0 and r.f1 == 1.0


# ------------------------------------------------------------ portable HLL

def test_hll_portable_accuracy_and_conservation(spark):
    # accuracy asserted at sf0.01 (n=1500 > 2.5m=640): the portable key
    # omits the small-range linear-counting branch (needs libm ln), so
    # below 2.5m the raw estimator is legitimately biased high
    sf = "/root/testdata/sf0.01"
    r = REGISTRY["sketch_hll_portable"].spark(spark, sf).collect()[0]
    assert r.m == 256
    assert r.n_nonempty + r.v_zero == 256
    # 1.04/sqrt(256) = 6.5% standard error; 3 sigma bound
    assert r.rel_err <= 0.2
    assert r.raw_est > 0
    n_cust_active = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    assert r.exact_distinct == n_cust_active


def test_hll_portable_registers_max_merge(spark):
    """Mergeability: registers built from odd/even key halves, combined
    with elementwise MAX, equal the registers built over all keys."""
    from pyspark.sql import functions as F
    from gcp_de_data_pipeline_cc_spark.plans.sketches import hll_mix

    keys = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(F.col("o_custkey").alias("key")).distinct()
    )

    def registers(df):
        h = hll_mix(df, "key").select("h")
        rho = h.select(
            F.pmod(F.col("h"), F.lit(256)).alias("bucket"),
            F.when((F.col("h") / 256).cast("long") == 0, F.lit(24))
            .otherwise(
                F.lit(24) - F.length(F.bin((F.col("h") / 256).cast("long")))
            )
            .alias("r"),
        )
        return {
            row.bucket: row.m_j
            for row in rho.groupBy("bucket").agg(F.max("r").alias("m_j")).collect()
        }

    whole = registers(keys)
    odd = registers(keys.filter(F.col("key") % 2 == 1))
    even = registers(keys.filter(F.col("key") % 2 == 0))
    merged = dict(odd)
    for bkt, m_j in even.items():
        merged[bkt] = max(merged.get(bkt, 0), m_j)
    assert merged == whole
