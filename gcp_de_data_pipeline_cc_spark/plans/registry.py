"""Registry pairing each Spark query with its DuckDB oracle SQL.

The driver contract (__spark_entry__.py) wants two dicts — ``queries()``
(name → callable(spark, sf_dir) → DataFrame) and ``oracle_sql()`` (name →
ANSI SQL). Keeping both halves of each operator side by side in one
decorator keeps column aliases in sync, which the driver's
order-insensitive value-hash comparison requires.

Float discipline (SURVEY.md §7): money columns are doubles; aggregates are
rounded at final projection — identically on both sides — so summation
order can't produce hash mismatches.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a Spark query implementation under ``name``.

    ``oracle`` is the DuckDB-runnable ANSI SQL producing the same result
    (same column names — the driver sorts columns by name then hashes
    values). ``None`` marks a genuinely non-SQL-expressible op; the driver
    then records a weaker rows-only check.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc=(fn.__doc__ or ""))
        return fn

    return deco
