"""Structured Streaming window operators over an event stream.

The reference is batch-only (SURVEY.md §2.6) — this is north-star
extension surface. Each operator takes an already-created streaming
DataFrame (readStream) with an event-time column and returns the windowed
aggregation; sinks/triggers are the caller's choice. Batch DataFrames are
accepted too (Spark's unified API): the same plan runs in either mode,
which is how the tests prove stream==batch equivalence.

Watermarks bound state: with a `delay` watermark, windows older than
max(event_time)-delay are finalized and evicted — mandatory for unbounded
streams at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound; no-op on batch DataFrames."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    delay: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Non-overlapping fixed windows: count + value sum per window+keys."""
    src = with_watermark(df, ts_col, delay)
    return (
        src.groupBy(F.window(ts_col, width).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    src = with_watermark(df, ts_col, delay)
    return (
        src.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    delay: str = "10 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Data-driven session windows: a session closes after `gap` of
    inactivity per key (streaming equivalent of the batch
    events_sessionize query)."""
    src = with_watermark(df, ts_col, delay)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    df: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exactly-once dedup: keep the first arrival per id.

    The watermark BOUNDS the dedup state — ids older than
    max(event_time) - delay are evicted, so memory is O(ids per delay
    window), not O(all ids ever seen). The contract is therefore
    "exactly-once within the watermark horizon": a duplicate arriving
    later than `delay` after the original is NOT suppressed. That is the
    standard at-scale trade (unbounded dedup state is not survivable on
    an unbounded stream); pair with a downstream batch dedup_exact pass
    when a hard global guarantee is needed."""
    src = with_watermark(df, ts_col, delay)
    if df.isStreaming:
        return src.dropDuplicatesWithinWatermark(list(id_cols))
    return src.dropDuplicates(list(id_cols))
