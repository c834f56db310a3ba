"""Three-way agreement for the shared rounding discipline.

Every oracle comparison leans on ``roundn``/``sql_roundn`` producing
bit-identical doubles in Spark and DuckDB. This test evaluates the SAME
expression in Python, DuckDB, and Spark over a value set deliberately
dense around the .xx5 rounding boundaries (where engine-native round()
implementations are KNOWN to disagree — the reason the helper exists)
and requires exact equality across all three, plus a demonstration that
native rounds actually do diverge somewhere in the set (i.e. the test
set has teeth).
"""

from __future__ import annotations

import math
import random

import duckdb

from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn


def _values() -> list[float]:
    rng = random.Random(20260814)
    vals = []
    # uniform magnitudes across money-like ranges
    for _ in range(2000):
        vals.append(rng.uniform(-1e6, 1e6))
    # boundary-adjacent: nearest doubles around k + 0.005
    for _ in range(2000):
        base = rng.randrange(-10_000_00, 10_000_00) / 100.0 + 0.005
        vals.append(base)
        vals.append(math.nextafter(base, math.inf))
        vals.append(math.nextafter(base, -math.inf))
    return vals


def test_roundn_identical_python_duckdb_spark(spark):
    vals = _values()
    py = [math.floor(v * 100.0 + 0.5) / 100.0 for v in vals]

    duck = duckdb.connect()
    duck.execute("CREATE TABLE t AS SELECT * FROM (VALUES (CAST(0 AS INT)))")
    duck.execute("DROP TABLE t")
    duck.register(
        "vals_df",
        __import__("pandas").DataFrame({"x": vals}),
    )
    dd = [
        r[0]
        for r in duck.execute(
            f"SELECT {sql_roundn('x', 2)} FROM vals_df"
        ).fetchall()
    ]

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    sp = [r[0] for r in sdf.select(roundn(F.col("x"), 2)).collect()]

    assert py == dd, "python vs duckdb diverged"
    assert py == sp, "python vs spark diverged"


def test_native_rounds_do_diverge_on_this_set(spark):
    """Sanity that the boundary set exercises the hazard: DuckDB's
    native ROUND and the floor-form must disagree for at least one
    value (if they never do, the helper is dead code and this suite
    proves nothing)."""
    vals = _values()
    duck = duckdb.connect()
    duck.register("vals_df", __import__("pandas").DataFrame({"x": vals}))
    n_diff = duck.execute(
        f"SELECT COUNT(*) FROM vals_df WHERE ROUND(x, 2) <> {sql_roundn('x', 2)}"
    ).fetchone()[0]
    assert n_diff > 0
