"""SCD Type 1 upsert — MERGE-INTO semantics without a table format.

The Delta/Iceberg ``MERGE INTO target USING updates ON key WHEN MATCHED
UPDATE SET * WHEN NOT MATCHED INSERT *`` expressed as a pure DataFrame
composition (full-outer join + row-level precedence), complementing the
history-keeping SCD2 operator (operators/scd2.py). The reference's raw
and staging tiers are overwrite-per-run (S4); SCD1 upsert is the
in-between: in-place updates, no history, no full rewrite of unmatched
rows at the logical level.

Scale: one key-hashed shuffle join, same as scd2_apply; with a real
lakehouse format the same call-site becomes ``DeltaTable.merge`` and
gains file-level pruning — the operator's interface is format-agnostic
on purpose.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd1_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Row-level upsert: update rows present in ``updates`` (the whole
    row wins, including its nulls — MERGE ``UPDATE SET *`` semantics,
    NOT per-column coalesce), insert new rows, keep unmatched target
    rows."""
    value_cols = [c for c in target.columns if c not in key_cols]
    t = target.alias("t")
    # row presence must be judged on the join, not a value column (values
    # may legitimately be null) — use a presence marker on the update side
    u_marked = updates.withColumn("_u_present", F.lit(True)).alias("u")
    joined = t.join(u_marked, on=list(key_cols), how="full_outer")
    take_update = F.coalesce(F.col("_u_present"), F.lit(False))
    out_cols = [
        *key_cols,
        *[
            F.when(take_update, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in value_cols
        ],
    ]
    return joined.select(*out_cols)
