"""Stateful streaming funnel via applyInPandasWithState.

The streaming twin of ``plans/queries_behavior.events_funnel_conversion``:
per user, a state machine advances through the ordered steps
(view -> click -> purchase), where each step must occur STRICTLY after
the time the previous step was first reached — the same semantics as the
batch query's chained first-qualifying-event joins.

State per user is just (stage, stage_ts): processing events in ascending
event time makes the first qualifying event the minimal one, so the
greedy machine computes exactly the batch definition. Events are sorted
within each micro-batch; cross-batch reordering is the usual
watermark-less caveat (replay in event-time order, or delay evaluation
by a watermark, for exactly-once parity on out-of-order feeds).
"""

from __future__ import annotations

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

FUNNEL_STEPS = ("view", "click", "purchase")

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", LongType()),  # 0 = none, len(steps) = converted
        StructField("stage_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType()),
        StructField("stage_ts", DoubleType()),  # epoch seconds
    ]
)


def user_funnel_stage(stream_df: DataFrame, steps: tuple = FUNNEL_STEPS) -> DataFrame:
    """Per-user funnel progress over a stream with columns
    (user_id long, ts timestamp, event_type string). Emits the user's
    current (stage, stage_ts) every time a micro-batch touches the key.

    Nested closure on purpose: cloudpickle ships it by value, so the
    operator needs no package install on the executors."""
    step_list = list(steps)

    def update_funnel(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import datetime as dt

        import pandas as pd

        (user_id,) = key
        stage, stage_ts = state.get if state.exists else (0, None)
        parts = [pdf for pdf in pdfs]
        if parts:
            ev = pd.concat(parts).sort_values("ts")
            for ts, etype in zip(ev["ts"], ev["event_type"]):
                if stage >= len(step_list):
                    break
                if etype != step_list[stage]:
                    continue
                t = ts.timestamp()
                # first step has no gate; later steps must be strictly
                # after the time the previous step was reached
                if stage == 0 or (stage_ts is not None and t > stage_ts):
                    stage += 1
                    stage_ts = t
        state.update((stage, stage_ts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "stage": [stage],
                "stage_ts": [
                    dt.datetime.utcfromtimestamp(stage_ts) if stage_ts else None
                ],
            }
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        update_funnel,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
