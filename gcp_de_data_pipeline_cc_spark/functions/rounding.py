"""Cross-engine deterministic rounding.

Different engines round doubles differently at representation
boundaries: Spark's ``round`` applies BigDecimal HALF_UP to the exact
binary expansion, DuckDB's multiplies and rints — e.g. the double nearest
6126.645 rounds to 6126.64 in Spark and 6126.65 in DuckDB. Since the
oracle comparison hashes values exactly, every rounded projection in the
query catalog instead uses the *same* floating-point expression on both
sides::

    floor(x * 10^n + 0.5) / 10^n

computed in double precision by identical operation sequences, so both
engines produce bit-identical results. (Float discipline: SURVEY.md §7
"what's hard" #4.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def roundn(col: Column, n: int = 2) -> Column:
    """Deterministic round-half-up to ``n`` decimals (double in, double out)."""
    p = float(10**n)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def sql_roundn(expr: str, n: int = 2) -> str:
    """The DuckDB/ANSI-SQL twin of :func:`roundn` — same double ops.

    Literals use exponent notation (``100.0e0``) so they parse as DOUBLE
    in *both* dialects: Spark SQL types a bare ``100.0`` as DECIMAL(3,1),
    which would silently turn the whole expression into decimal math when
    this helper is embedded in a ``spark.sql`` string (DuckDB keeps it
    double either way) — a cross-engine hash mismatch at exactly the
    .xx5 rounding boundaries this helper exists to kill.
    """
    p = 10**n
    return f"FLOOR(({expr}) * {p}.0e0 + 0.5e0) / {p}.0e0"
