"""Window/top-k/percentile analytics queries + TPC-H Q10-style join.

All single-shuffle Catalyst plans. The sliding-window batch query mirrors
the streaming sliding window in streaming/windows.py — same grouping
expression, so the batch oracle also validates the streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_agent_spark.plans.registry import register, table


@register(
    "topn_orders_per_status",
    oracle="""
        SELECT o_orderstatus, o_orderkey,
               round(o_totalprice, 6) AS o_totalprice,
               CAST(rn AS BIGINT) AS rn
        FROM (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders
        )
        WHERE rn <= 3
    """,
    description="top-N per group: rank-filter window, shuffles once on the group key",
)
def topn_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("o_totalprice"),
            "rn",
        )
    )


@register(
    "grouped_percentiles_totalprice",
    materializes_on_build=True,
    oracle="""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 6) AS p90
        FROM orders GROUP BY o_orderpriority
    """,
    description="exact grouped percentiles (linear interpolation, matches quantile_cont)",
)
def grouped_percentiles_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped EXACT percentiles without grouped ``F.percentile``: the
    priority domain is bounded (5 values) while each group scales with
    the data, so the exact aggregate would buffer n/5 values per reducer.
    ``operators.ranking.exact_percentiles`` resolves all 10 order
    statistics (5 keys x p50/p90) with scan-only distributed selection;
    the bounded key domain is collected first to build the spec list."""
    from data_pipeline_agent_spark.operators.ranking import grouped_exact_percentiles

    df = table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    out = grouped_exact_percentiles(
        df, "o_orderpriority", "o_totalprice", [0.5, 0.9], ["p50", "p90"]
    )
    return out.select(
        "o_orderpriority",
        F.round("p50", 6).alias("p50"),
        F.round("p90", 6).alias("p90"),
    )


@register(
    "events_sliding_30min",
    oracle="""
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        w AS (
          SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000)
                   AS window_start, event_type, value
          FROM e
          UNION ALL
          SELECT make_timestamp(CAST(floor((epoch(ts) - 1800) / 3600) * 3600 + 1800 AS BIGINT) * 1000000),
                 event_type, value
          FROM e
        )
        SELECT window_start, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM w GROUP BY 1, 2
    """,
    description="sliding window (1h every 30min): each event lands in 2 windows",
)
def events_sliding_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


@register(
    "q10_returned_revenue",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
               n.n_name
        FROM customer c
          JOIN orders o ON c.c_custkey = o.o_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    description="TPC-H Q10-style: returned-item revenue per customer, top 20",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    # customer scales with SF — no broadcast hint (AQE decides); nation is a
    # bounded dimension and keeps its hint.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "lag_order_gap_days",
    oracle="""
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(avg(gap_days), 6) AS avg_gap_days
        FROM (
            SELECT o_custkey,
                   date_diff('day',
                             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                    ORDER BY o_orderdate, o_orderkey),
                             o_orderdate) AS gap_days
            FROM orders
        )
        WHERE gap_days IS NOT NULL
        GROUP BY o_custkey
        HAVING count(*) >= 5
    """,
    description="lag window: per-customer inter-order gap, one shuffle on custkey",
)
def lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.withColumn(
        "gap_days",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("long"),
    ).where(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.avg("gap_days"), 6).alias("avg_gap_days"),
        )
        .where(F.col("n_orders") >= 5)
    )


@register(
    "moving_avg_daily_revenue",
    oracle="""
        SELECT strftime(d, '%Y-%m-%d') AS d,
               round(rev, 6) AS rev,
               round(avg(rev) OVER (ORDER BY d
                                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
                   AS rev_ma7
        FROM (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   sum(o_totalprice) AS rev
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-01-01'
            GROUP BY CAST(o_orderdate AS DATE)
        )
    """,
    description="7-row moving average over daily revenue (agg first: window input "
    "is days-sized, so the unpartitioned window is deliberately tiny)",
)
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "2000-01-01")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev_raw")
    )
    # Window over ~hundreds of day rows — aggregate BEFORE windowing so the
    # single-partition window sees days, never raw orders.
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        F.round("rev_raw", 6).alias("rev"),
        F.round(F.avg("rev_raw").over(w), 6).alias("rev_ma7"),
    )


@register(
    "cumulative_monthly_revenue",
    oracle="""
        SELECT strftime(m, '%Y-%m-%d') AS m,
               round(rev, 6) AS rev,
               round(sum(rev) OVER (ORDER BY m
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW), 2) AS rev_cum
        FROM (
            SELECT date_trunc('month', o_orderdate) AS m,
                   sum(o_totalprice) AS rev
            FROM orders
            GROUP BY date_trunc('month', o_orderdate)
        )
    """,
    description="running total of monthly revenue (agg-then-window, months-sized)",
)
def cumulative_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("mm")).agg(
        F.sum("o_totalprice").alias("rev_raw")
    )
    w = Window.orderBy("mm").rowsBetween(Window.unboundedPreceding, 0)
    # Month rendered as an ISO date string on BOTH sides so the oracle
    # compare is type-exact (timestamp vs date drift otherwise).
    return monthly.select(
        F.date_format("mm", "yyyy-MM-dd").alias("m"),
        F.round("rev_raw", 6).alias("rev"),
        F.round(F.sum("rev_raw").over(w), 2).alias("rev_cum"),
    )


@register(
    "decile_customer_acctbal",
    materializes_on_build=True,
    oracle="""
        WITH cuts AS (
            SELECT quantile_cont(c_acctbal,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
            FROM customer
        )
        SELECT CAST(1 + len(list_filter(qs, q -> c_acctbal > q)) AS BIGINT)
                   AS decile,
               CAST(count(*) AS BIGINT) AS n,
               round(min(c_acctbal), 6) AS lo,
               round(max(c_acctbal), 6) AS hi,
               round(avg(c_acctbal), 6) AS mean_bal
        FROM customer, cuts
        GROUP BY 1
    """,
    description="distributed decile bucketing of customer balances: "
    "percentile cutoffs from one aggregate, bucket assignment by cutoff "
    "comparison — never a global ntile sort",
)
def decile_customer_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quantile bucketing WITHOUT the global sort. ``ntile(10)
    OVER (ORDER BY ...)`` funnels every row through one partition (the
    unpartitioned-window scale-killer); instead the 9 decile cutoffs come
    from a single percentile aggregate (1 row, broadcast), and each row's
    decile is 'how many cutoffs am I above' — a pure scan-stage
    expression. Bucket populations differ from exact ntile only at
    duplicate boundary values, which quantile bucketing resolves by value
    (all ties land in one bucket) rather than by arbitrary row order —
    the better semantics for analytics anyway. The 9 cutoffs come from
    ``operators.ranking.exact_percentiles`` (scan-only distributed
    selection, same linear interpolation as F.percentile/quantile_cont)
    — no reducer ever buffers the column — and land in the scan
    expression as a literal array."""
    from data_pipeline_agent_spark.operators.ranking import exact_percentiles

    cust = table(spark, sf_dir, "customer")
    specs = [(1, p / 10.0, f"q{p}") for p in range(1, 10)]
    row = exact_percentiles(
        cust.select(F.lit(1).alias("__g"), "c_acctbal"), "__g", "c_acctbal", specs
    ).first()
    vals = [row[f"q{p}"] for p in range(1, 10)]
    if any(v is None for v in vals):
        # empty/all-NULL input: no deciles exist — empty result, same as
        # the grouped-aggregate shape this replaced (not a float() crash)
        cust = cust.where(F.lit(False))
        vals = [0.0] * 9
    qs = F.array(*[F.lit(float(v)) for v in vals])
    return (
        cust.select(
            "c_acctbal",
            (
                F.lit(1)
                + F.size(F.filter(qs, lambda q: F.col("c_acctbal") > q))
            )
            .cast("long")
            .alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("c_acctbal"), 6).alias("lo"),
            F.round(F.max("c_acctbal"), 6).alias("hi"),
            F.round(F.avg("c_acctbal"), 6).alias("mean_bal"),
        )
    )


_SES_ALPHA = 0.3  # smoothing factor


@register(
    "forecast_ses_monthly_revenue",
    oracle=f"""
        WITH m AS (
            SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month,
                   round(sum(o_totalprice), 6) AS revenue
            FROM orders GROUP BY 1
        ),
        idx AS (
            SELECT month, revenue,
                   row_number() OVER (ORDER BY month) AS t,
                   count(*) OVER () AS n
            FROM m
        )
        SELECT month, revenue,
               round(sum({_SES_ALPHA} * revenue * pow(1 - {_SES_ALPHA}, -t))
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
                     * pow(1 - {_SES_ALPHA}, t)
                     + first_value(revenue) OVER (ORDER BY t)
                       * pow(1 - {_SES_ALPHA}, t) * (1 - {_SES_ALPHA}), 6)
                   AS ses
        FROM idx
    """,
    description=f"simple exponential smoothing (alpha={_SES_ALPHA}) of monthly "
    "revenue in closed form: s_t = a*sum (1-a)^(t-i) y_i + (1-a)^t s_0 with "
    "s_0 = y_1 — a running window sum, no recursion",
)
def forecast_ses_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SES without sequential state: expand the recurrence
    s_t = a*y_t + (1-a)*s_{t-1} into its closed form and compute it as a
    cumulative window sum of a*y_i*(1-a)^(-i), rescaled by (1-a)^t — the
    standard trick for turning a linear recurrence into a prefix scan.
    The window input is the months-sized aggregate (the fact table is
    reduced first), so the unpartitioned ordering is bounded — the same
    justification as moving_avg_daily_revenue. Numerics note: (1-a)^(-t)
    grows geometrically; for month counts this stays far inside double
    range (here t<=85, (1/0.7)^85 ~ 1e13), and both engines compute the
    identical expression."""
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 6).alias("revenue"))
    w = Window.orderBy("month")
    idx = monthly.select(
        "month", "revenue", F.row_number().over(w).alias("t")
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    a = _SES_ALPHA
    term = F.lit(a) * F.col("revenue") * F.pow(F.lit(1 - a), -F.col("t"))
    s0 = F.first("revenue").over(Window.orderBy("t"))
    return idx.select(
        "month",
        "revenue",
        F.round(
            F.sum(term).over(wcum) * F.pow(F.lit(1 - a), F.col("t"))
            + s0 * F.pow(F.lit(1 - a), F.col("t")) * F.lit(1 - a),
            6,
        ).alias("ses"),
    )


@register(
    "customer_trailing_7d_revenue",
    oracle="""
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
               ), 6) AS trailing_7d
        FROM orders
    """,
    description="RANGE-frame window: per customer, trailing-7-day order "
    "revenue (time-valued frame bounds, not row counts) — the frame "
    "variety ROWS windows cannot express when events are irregular",
)
def customer_trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames bound by VALUE distance (here 7 days of epoch
    seconds), so ties and gaps behave correctly where a ROWS frame would
    not: all orders on the same day share one frame, sparse customers
    are not over-weighted. One shuffle partitioned by customer; the sort
    key is the numeric epoch because both engines define RANGE offsets
    over numerics identically (interval-typed RANGE bounds differ in
    dialect)."""
    orders = table(spark, sf_dir, "orders")
    ep = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(ep.alias("ep"))
        .rangeBetween(-604800, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 6).alias("trailing_7d"),
    )


@register(
    "scd2_customer_priority_intervals",
    oracle="""
        WITH ordered AS (
            SELECT o_custkey, o_orderpriority,
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
                   row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS rn,
                   lag(o_orderpriority) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS prev_p
            FROM orders
        ),
        changes AS (
            SELECT o_custkey, o_orderpriority, d,
                   sum(CASE WHEN prev_p IS NULL OR prev_p <> o_orderpriority
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY o_custkey ORDER BY rn) AS version
            FROM ordered
        )
        SELECT o_custkey AS custkey, o_orderpriority AS priority,
               CAST(version AS BIGINT) AS version,
               min(d) AS valid_from, max(d) AS last_seen,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM changes
        GROUP BY o_custkey, o_orderpriority, version
    """,
    description="SCD2 interval build: collapse each customer's order-"
    "priority history into versioned validity intervals (change detection "
    "via lag + cumulative version counter, the slowly-changing-dimension "
    "snapshot transform)",
)
def scd2_customer_priority_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse SCD2 build as two windows + one aggregate, all
    partitioned on the same customer key (one shuffle end to end):
    lag detects value changes, a running sum of change flags assigns
    version numbers, and the group-by collapses consecutive runs into
    intervals. No self-join, no per-entity collect — the standard
    change-point pattern at any scale."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ordered = orders.select(
        "o_custkey",
        "o_orderpriority",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("d"),
        F.row_number().over(w).alias("rn"),
        F.lag("o_orderpriority").over(w).alias("prev_p"),
    )
    chg = F.when(
        F.col("prev_p").isNull() | (F.col("prev_p") != F.col("o_orderpriority")),
        F.lit(1),
    ).otherwise(F.lit(0))
    wv = Window.partitionBy("o_custkey").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    changes = ordered.select(
        "o_custkey", "o_orderpriority", "d", F.sum(chg).over(wv).alias("version")
    )
    return changes.groupBy("o_custkey", "o_orderpriority", "version").agg(
        F.min("d").alias("valid_from"),
        F.max("d").alias("last_seen"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("version").cast("long").alias("version"),
        "valid_from",
        "last_seen",
        "n_orders",
    )


@register(
    "latest_order_per_customer",
    oracle="""
        SELECT o_custkey AS custkey,
               strftime(max(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS latest_date,
               arg_max(o_totalprice,
                       CAST(o_orderdate AS TIMESTAMP) + to_microseconds(o_orderkey))
                   AS latest_totalprice,
               CAST(arg_max(o_orderkey,
                       CAST(o_orderdate AS TIMESTAMP) + to_microseconds(o_orderkey))
                   AS BIGINT) AS latest_orderkey
        FROM orders GROUP BY o_custkey
    """,
    description="top-1-per-group WITHOUT a window: max_by/arg_max keeps "
    "each customer's latest order via a plain aggregate — partial "
    "aggregation runs map-side, so no per-group sort and no window "
    "shuffle of raw rows (tiebreak folded into the ordering key)",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The agg-based alternative to row_number()-over-window for top-1:
    max_by partial-aggregates on the map side (each task keeps one row
    per customer before the exchange), where a window must shuffle and
    sort EVERY raw row. The ordering key folds the orderkey in as a
    deterministic tiebreak at MICROsecond scale (keys stay far below one
    day's 86.4e9 us, so the date always dominates) — the same monotone
    key in both engines, exact in a double to 2^53."""
    orders = table(spark, sf_dir, "orders")
    ordkey = (
        F.col("o_orderdate").cast("timestamp").cast("double") * F.lit(1_000_000.0)
        + F.col("o_orderkey")
    )
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.date_format(F.max(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "latest_date"
        ),
        F.max_by("o_totalprice", ordkey).alias("latest_totalprice"),
        F.max_by("o_orderkey", ordkey).cast("long").alias("latest_orderkey"),
    )
