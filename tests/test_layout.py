"""Layout-management tests: the queries' CONTENT invariance is covered by
the registry oracles; these assert the PHYSICAL effects — file counts
after compaction, files touched under a selective box filter after
z-ordering — which are the entire point of the operators."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans.layout import (
    Z_BITS,
    compact_dir,
    zvalue_col,
)

SF_DIR = "/root/testdata/sf0.01"


def _parquet_files(path: str) -> list[str]:
    return [
        os.path.join(root, f)
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]


def test_compaction_reduces_file_count_preserves_content(spark):
    src = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tmp = tempfile.mkdtemp(prefix="compact_test_")
    frag = f"{tmp}/frag"
    src.repartition(20).write.parquet(frag)
    assert len(_parquet_files(frag)) == 20

    tight = f"{tmp}/tight"
    compact_dir(spark, frag).write.parquet(tight)
    # ~0.3 MB of data vs 128 MB target → exactly one output file
    assert len(_parquet_files(tight)) == 1
    a = spark.read.parquet(tight).agg(
        F.count("*"), F.sum("o_orderkey")
    ).collect()[0]
    b = src.agg(F.count("*"), F.sum("o_orderkey")).collect()[0]
    assert tuple(a) == tuple(b)


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 5)], ["x", "y"])
    got = df.select(
        zvalue_col(F.col("x"), F.col("y")).alias("z")
    ).collect()[0]["z"]
    # x=0b011 → odd positions 1,3; y=0b101 → even positions 0,4
    assert got == (1 << 1) + (1 << 3) + (1 << 0) + (1 << 4)
    # locality: nearby points interleave to nearby z-values
    assert Z_BITS == 16


def test_zorder_box_filter_touches_few_files(spark):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    x = F.col("o_custkey").cast("long").bitwiseAND(F.lit((1 << Z_BITS) - 1))
    y = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .bitwiseAND(F.lit((1 << Z_BITS) - 1))
    )
    tmp = tempfile.mkdtemp(prefix="zorder_test_")
    (
        o.withColumn("zval", zvalue_col(x, y))
        .repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.parquet(f"{tmp}/z")
    )
    total = len(_parquet_files(f"{tmp}/z"))
    assert total >= 8

    box = (
        F.col("o_custkey").between(100, 500)
        & (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    touched = (
        spark.read.parquet(f"{tmp}/z")
        .filter(box)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    # the box is ~2.6% of rows; z-clustering must confine it to a
    # minority of files (a linear layout spreads it over ALL of them)
    assert touched < total / 2, f"box touched {touched}/{total} files"

    # control: the same box over an unclustered (hash-scattered) layout
    # touches EVERY file — the baseline z-order exists to beat
    o.repartition(8).write.parquet(f"{tmp}/scattered")
    sc_total = len(_parquet_files(f"{tmp}/scattered"))
    sc_touched = (
        spark.read.parquet(f"{tmp}/scattered")
        .filter(box)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert sc_touched == sc_total
    assert touched < sc_touched
