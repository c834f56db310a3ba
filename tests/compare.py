"""Order-insensitive DataFrame comparison mirroring the driver's oracle
check: column-name set + row count + value equality (floats under
tolerance), independent of row order."""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import pandas as pd


def _is_null(v: Any) -> bool:
    if isinstance(v, (list, tuple)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _canon(v: Any) -> str:
    """Canonical sort-key string for one value."""
    if _is_null(v):
        return "\x00null"
    if isinstance(v, float):
        return f"{round(v, 6):.6f}"
    if isinstance(v, (pd.Timestamp, dt.datetime, dt.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _values_equal(a: Any, b: Any) -> bool:
    a_null, b_null = _is_null(a), _is_null(b)
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-6)
    if isinstance(a, (pd.Timestamp, dt.datetime, dt.date)) or isinstance(
        b, (pd.Timestamp, dt.datetime, dt.date)
    ):
        return pd.Timestamp(a) == pd.Timestamp(b)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(r) for r in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple(_canon(v) for v in r))
    return rows


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s_rows = _normalize(spark_df)
    o_rows = _normalize(oracle_df)
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if not all(_values_equal(a, b) for a, b in zip(sr, orow)):
            raise AssertionError(
                f"{name}: row {i} differs\n  spark : {sr}\n  oracle: {orow}"
            )
