"""Event-time streaming analytics (ops T2-T6).

``F.window`` / ``F.session_window`` aggregations are engine-identical in
batch and streaming execution, so the plan catalog validates their
semantics against the SQL oracle in batch mode while these helpers run
the same expressions as real streams (with watermarks bounding state).
Tests assert batch/stream result equality — the strongest check
available for streaming operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn


def _window_projection(win: Column) -> list[Column]:
    return [
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
    ]


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """T2 — tumbling event-time windows: count/sum/value stats per bucket."""
    return (
        events.groupBy(F.window("ts", width).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            roundn(F.sum("value")).alias("sum_value"),
        )
        .select(*_window_projection(F.col("win")), "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """T3 — sliding (hopping) windows; each event lands in width/slide
    overlapping buckets."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(*_window_projection(F.col("win")), "n_events")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """T4 — gap-based sessions per user; session end = last event + gap."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            roundn(F.sum("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """T5 — bound event-time state; streaming aggregations drop events
    older than max(event time) - delay and finalize windows past it."""
    return events.withWatermark("ts", delay)


def streaming_dedup(events: DataFrame, keys: list[str], delay: str = "1 hour") -> DataFrame:
    """T6 — stateful exactly-once dedup within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps state only for ``delay`` of
    event time — bounded memory at any scale, unlike global
    ``dropDuplicates`` on a stream.
    """
    return with_watermark(events, delay).dropDuplicatesWithinWatermark(keys)
