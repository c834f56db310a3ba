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


def _coarse(v: Any) -> str:
    """Sort key for float columns, deliberately coarser (1e-4) than the
    equality tolerance (1e-6): two tolerance-equal values must map to
    sort keys that can only differ at a boundary 100× wider than the
    tolerance, so cross-engine rounding jitter can't misalign rows."""
    if _is_null(v):
        return "\x00null"
    try:
        return f"{round(float(v), 4):.4f}"
    except (TypeError, ValueError):
        return _canon(v)


def _normalize(df: pd.DataFrame, float_cols: set[str]) -> list[tuple]:
    """Rows sorted by (non-float columns, then coarse float keys) so rows
    equal-within-tolerance align identically across engines whenever the
    exact-typed columns (keys, counts, strings, dates) disambiguate."""
    cols = sorted(df.columns)
    non_float = [i for i, c in enumerate(cols) if c not in float_cols]
    floats = [i for i, c in enumerate(cols) if c in float_cols]
    rows = [tuple(r) for r in df[cols].itertuples(index=False, name=None)]
    rows.sort(
        key=lambda r: (
            tuple(_canon(r[i]) for i in non_float),
            tuple(_coarse(r[i]) for i in floats),
        )
    )
    return rows


def _float_columns(*dfs: pd.DataFrame) -> set[str]:
    out: set[str] = set()
    for df in dfs:
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                out.add(c)
    return out


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    # float-ness decided per column across BOTH frames so the sort-key
    # structure is identical even when one engine returns int64 where
    # the other returns float64
    float_cols = _float_columns(spark_df, oracle_df)
    s_rows = _normalize(spark_df, float_cols)
    o_rows = _normalize(oracle_df, float_cols)
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if not all(_values_equal(a, b) for a, b in zip(sr, orow)):
            raise AssertionError(
                f"{name}: row {i} differs\n  spark : {sr}\n  oracle: {orow}"
            )
