"""Schema parity audit: for every oracle-paired query, the Spark result
schema and the DuckDB result's *declared* column types must agree
category-by-category. Catches silent engine-type divergences (DuckDB
SUM(int)→HUGEINT, RANK()→BIGINT vs Spark int) that a value-tolerant
comparison hides but a strict driver-side schema/hash check would flag.

Declared types (Spark `df.schema`, DuckDB `rel.types`) are compared —
not pandas dtypes, which mangle both engines' DATE into different
representations.
"""

from __future__ import annotations

import re

import pytest

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR

ORACLE_KEYS = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)

_SPARK_CATEGORY = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "boolean": "bool",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}

_DUCK_CATEGORY = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",  # never matches a Spark type — always a bug
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "BOOLEAN": "bool",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
}


def _spark_cat(simple: str) -> str:
    if simple.startswith("array<"):
        return "array"
    if simple.startswith("decimal"):
        return "decimal"
    return _SPARK_CATEGORY.get(simple, simple)


def _duck_cat(decl: str) -> str:
    if decl.endswith("[]"):
        return "array"
    if decl.startswith("DECIMAL"):
        return "decimal"
    return _DUCK_CATEGORY.get(decl, decl)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_declared_types_match(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, SF_DIR)
    spark_types = {f.name: _spark_cat(f.dataType.simpleString()) for f in sdf.schema}
    rel = duck.sql(re.sub(r"\s+", " ", spec.oracle))
    duck_types = dict(zip(rel.columns, (_duck_cat(str(t)) for t in rel.types)))
    assert set(spark_types) == set(duck_types), f"{name}: column sets differ"
    for col in sorted(spark_types):
        assert spark_types[col] == duck_types[col], (
            f"{name}.{col}: spark={spark_types[col]} oracle={duck_types[col]}"
        )


def test_all_registered_outputs_are_scalar_typed(spark):
    """The driver's row canonicalizer crashes on pandas list/struct
    cells (r2: dedup_simhash / multimodal_features ERR) — every
    registered query's output schema must therefore be atomic-typed
    only. Library operators may return arrays; the registered WRAPPER
    serializes them (to_json/concat_ws)."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        MapType,
        StructType,
    )

    offenders = {}
    for name, spec in sorted(REGISTRY.items()):
        try:
            df = spec.spark(spark, SF_DIR)
        except Exception:
            continue  # side-effecting builds have dedicated tests
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType,
                                       BinaryType)):
                offenders.setdefault(name, []).append(
                    f"{f.name}: {f.dataType.simpleString()}"
                )
    assert not offenders, offenders
