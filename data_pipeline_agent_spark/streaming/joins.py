"""Stream-stream interval joins (Structured Streaming's join surface).

The reference is batch-only (SURVEY.md §2.6) — extension surface. Like
streaming/windows.py, every operator accepts a streaming OR batch
DataFrame (unified API): the identical plan runs in both modes, which is
how the tests prove stream==batch equivalence, and the batch form is what
the DuckDB oracle checks.

State-bound design: a stream-stream inner join keeps each side buffered
until the watermark plus the join's time bound passes — so BOTH sides
carry a watermark and the join condition carries an explicit event-time
range. Without the range the state is unbounded and the query is
(correctly) rejected by Spark in append mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_agent_spark.streaming.windows import with_watermark


def followup_within(
    df: DataFrame,
    first_type: str = "view",
    next_type: str = "purchase",
    key: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "5 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Pairs of (first event, follow-up event) for the same key where the
    follow-up lands within ``(first_ts, first_ts + horizon]`` — e.g. a
    purchase within 5 minutes of a view: the conversion-attribution join.

    Both sides are the SAME input filtered by type, each with its own
    watermark; the closed time range bounds the join state to
    O(events per horizon+delay window) per key. Strict inequality on the
    lower bound keeps self-simultaneous events out (an event is not its
    own follow-up even when ids differ).
    """
    l = with_watermark(
        df.where(F.col("event_type") == first_type), ts_col, delay
    ).alias("l")
    r = with_watermark(
        df.where(F.col("event_type") == next_type), ts_col, delay
    ).alias("r")
    lts, rts = F.col(f"l.{ts_col}"), F.col(f"r.{ts_col}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts > lts)
        & (rts <= lts + F.expr(f"INTERVAL {horizon}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        lts.alias("first_ts"),
        rts.alias("next_ts"),
        (F.unix_timestamp(rts) - F.unix_timestamp(lts)).cast("long").alias("gap_seconds"),
        F.col("r.value").alias("next_value"),
    )
