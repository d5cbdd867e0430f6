"""Behavioral / time-series analytics over the events and orders tables:
ordered funnel conversion, weekly cohort retention, and gap-filled daily
resampling with forward fill.

These are the product-analytics queries every event pipeline ends up
needing (funnel -> retention -> time-series); each is a pure DataFrame
plan whose only shuffles are keyed on user_id / the date grain, with a
DuckDB oracle twin.  The reference (/root/reference/main.py) has no
event-log surface at all (SURVEY.md §2.6) — north-star extension work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_agent_spark.plans.registry import events_table, register, table

# the ordered funnel: each later step must happen strictly AFTER the
# user's first qualifying occurrence of the previous step
FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "events_funnel_conversion",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT * FROM (
            SELECT 'view' AS step, CAST(1 AS BIGINT) AS step_idx,
                   CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
            UNION ALL
            SELECT 'click', CAST(2 AS BIGINT),
                   CAST((SELECT count(*) FROM c) AS BIGINT)
            UNION ALL
            SELECT 'purchase', CAST(3 AS BIGINT),
                   CAST((SELECT count(*) FROM p) AS BIGINT)
        )
    """,
    description="ordered funnel view->click->purchase: users reaching each "
    "step strictly after their first qualifying previous step",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion. Each stage is one groupBy(user_id) over
    the type-filtered events joined to the previous stage's first-times —
    every shuffle is keyed on user_id, so on a cluster that pre-partitions
    the event log by user (the standard layout) all three stages reuse one
    exchange and nothing ever goes through the driver. Stage frames are
    users-sized (one row per converting user), far smaller than the log."""
    ev = events_table(spark, sf_dir)

    def first_after(step: str, prev: DataFrame | None) -> DataFrame:
        e = ev.where(F.col("event_type") == step)
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col("t")).drop("t")
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    stages: list[DataFrame] = []
    prev = None
    for step in FUNNEL_STEPS:
        prev = first_after(step, prev)
        stages.append(prev)

    counts = [
        s.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(step).alias("step"),
            F.lit(i + 1).cast("long").alias("step_idx"),
            "n_users",
        )
        for i, (step, s) in enumerate(zip(FUNNEL_STEPS, stages))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


@register(
    "events_weekly_retention",
    oracle="""
        WITH wk AS (
            SELECT user_id,
                   CAST(floor(date_diff('day', DATE '2024-01-01',
                                        CAST(ts AS DATE)) / 7) AS BIGINT) AS w
            FROM events
        ),
        first_wk AS (SELECT user_id, min(w) AS w0 FROM wk GROUP BY user_id)
        SELECT w0 AS cohort_week,
               w - w0 AS week_offset,
               CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
        FROM wk JOIN first_wk USING (user_id)
        GROUP BY w0, w - w0
    """,
    description="weekly cohort retention: users active in week w0+k per "
    "first-seen cohort week w0 (the classic retention triangle)",
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle. Two aggregations keyed on user_id (first
    week, then distinct user-weeks) and one users-sized join — the event
    log is touched once, everything after the first shuffle is
    users x weeks sized. No windows, no driver collection."""
    ev = events_table(spark, sf_dir)
    wk = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
        )
        .cast("long")
        .alias("w"),
    )
    first_wk = wk.groupBy("user_id").agg(F.min("w").alias("w0"))
    return (
        wk.join(first_wk, "user_id")
        .groupBy(
            F.col("w0").alias("cohort_week"),
            (F.col("w") - F.col("w0")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


@register(
    "resample_daily_revenue_gapfill",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   round(sum(o_totalprice), 6) AS revenue
            FROM orders WHERE o_orderpriority = '1-URGENT'
            GROUP BY CAST(o_orderdate AS DATE)
        ),
        bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
        spine AS (
            SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
            FROM bounds
        )
        SELECT strftime(spine.d, '%Y-%m-%d') AS d,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(revenue, 0.0) AS revenue,
               last_value(revenue IGNORE NULLS) OVER (
                   ORDER BY spine.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS revenue_ffill
        FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
    description="time-series resampling: continuous daily spine over the "
    "1-URGENT order range, gaps filled with 0 and last-observation-carried-"
    "forward revenue",
)
def resample_daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resample. The date spine is generated with
    ``sequence()`` from a 1-row bounds aggregate (broadcast cross join —
    never a driver collect), left-joined to the aggregated daily frame.
    The forward-fill window is unpartitioned BUT its input is days-sized
    (the aggregate ran first), the same bounded-window pattern as
    moving_avg_daily_revenue. At 100 TB the spine is still just one row
    per day — only the first aggregation touches the fact table."""
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 6).alias("revenue"),
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "d", "left")
        .select(
            "d",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.last(F.col("revenue"), ignorenulls=True).over(w).alias("revenue_ffill"),
        )
        .withColumn("d", F.date_format("d", "yyyy-MM-dd"))
    )


@register(
    "events_activity_islands",
    oracle="""
        WITH d AS (
            SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
            FROM events
        ),
        s AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (PARTITION BY user_id
                        ORDER BY day) AS INTEGER) AS anchor
            FROM d
        ),
        g AS (
            SELECT user_id, anchor, count(*) AS len
            FROM s GROUP BY user_id, anchor
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_streaks,
               CAST(max(len) AS BIGINT) AS longest_streak,
               CAST(sum(len) AS BIGINT) AS n_active_days
        FROM g GROUP BY user_id
    """,
    description="gaps-and-islands: per-user consecutive-active-day streaks "
    "(count, longest, total active days) via the date-minus-row_number "
    "anchor trick",
)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic gaps-and-islands shape: consecutive days collapse to a
    common anchor (day - row_number), so streaks fall out of two grouped
    aggregates. The window and both aggregates are all partitioned by
    user_id — the same single shuffle key end to end, so AQE plans one
    exchange; nothing here is corpus-ordered."""
    ev = table(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    s = d.withColumn("anchor", F.date_sub(F.col("day"), F.row_number().over(w)))
    g = s.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
    )


@register(
    "events_daily_anomaly_zscore",
    oracle="""
        WITH d AS (
            SELECT event_type,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT event_type, day, n,
                   avg(n) OVER (PARTITION BY event_type) AS mu,
                   stddev_samp(n) OVER (PARTITION BY event_type) AS sd
            FROM d
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
               CAST(n AS BIGINT) AS n,
               round((n - mu) / sd, 6) AS z
        FROM s WHERE abs((n - mu) / sd) > 2
    """,
    description="volume anomaly detection: days whose event count sits "
    "more than 2 sample-stddevs from that event type's mean (the daily "
    "data-quality canary for ingest pipelines)",
)
def events_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalies computed entirely on the aggregated (type, day) grain:
    the fact table reduces first (one shuffle), then the per-type
    mean/stddev window runs over the days-sized frame — the bounded-
    window-input pattern shared with moving_avg/gapfill. Both engines
    evaluate identical double expressions over identical small inputs,
    so the rounded z-scores hash-match."""
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    s = d.select(
        "event_type",
        "day",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return s.where(F.abs(z) > 2).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.round(z, 6).alias("z"),
    )
