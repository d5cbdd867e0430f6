"""Relational/analytical query surface — joins, windows, set operations,
grouping sets, sessionization, JSON functions.

The reference has none of these (SURVEY.md §2.6 "categories the reference
does NOT implement"); they are the north-star extension surface
(BASELINE.json) that makes the engine a complete analytics engine. All are
pure DataFrame/Catalyst plans: broadcast hints for dimension tables, one
shuffle per agg/join key, AQE everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_agent_spark.plans.registry import register, table

# --- TPC-H Q1: scan-heavy grouped aggregate (the flagship) -------------------


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 6) AS sum_qty,
               round(sum(l_extendedprice), 6) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 pricing summary: pushdown filter + grouped agg",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(disc_price), 6).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


# --- TPC-H Q3-style: 3-way join + agg + top-k --------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    description="TPC-H Q3-style: selective dim filter, 3-way join, top-k",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    # customer scales with SF (the segment filter keeps ~1/5 of it) — no
    # forced broadcast; AQE picks broadcast while it fits the threshold.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# --- TPC-H Q5-style: 5-way star join ----------------------------------------


@register(
    "q5_regional_revenue",
    oracle="""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    description="TPC-H Q5-style star join: broadcast dims, one fact shuffle",
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dims = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # customer and the supplier-side dims both scale with SF — no forced
    # broadcast (nation/region above keep their hints; they are bounded).
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            dims,
            (li.l_suppkey == dims.s_suppkey) & (cust.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


# --- Window functions: rank / lag / running aggregate ------------------------


@register(
    "window_order_rank",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS price_rank,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_spend,
               round(lag(o_totalprice) OVER w, 6) AS prev_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    description="window functions: row_number, rank, running sum, lag",
)
def window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    wrank = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return df.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(wrank).cast("long").alias("price_rank"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).alias("running_spend"),
        F.round(F.lag("o_totalprice").over(w), 6).alias("prev_price"),
    )


# --- Grouping sets / rollup ---------------------------------------------------


@register(
    "rollup_order_totals",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 6) AS total,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    description="rollup (grouping sets) with subtotal and grand-total rows",
)
def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "orders")
    return df.rollup("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 6).alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# --- Set operations -----------------------------------------------------------


@register(
    "setop_customers_without_orders",
    oracle="""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    """,
    description="set operation EXCEPT (anti-semantics over keys)",
)
def setop_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL EXCEPT is a SET operation: distinct both sides FIRST, then
    # exceptAll.  (exceptAll-then-distinct is NOT equivalent — a value with
    # multiplicity 3 on the left and 1 on the right would survive it, while
    # EXCEPT removes every value present on the right at all.)
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    ord_keys = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.distinct().exceptAll(ord_keys.distinct())


@register(
    "semijoin_customers_with_orders",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    description="left-semi join (EXISTS)",
)
def semijoin_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


# --- Event-stream batch analytics: tumbling window + sessionization ----------


@register(
    "events_hourly_tumbling",
    oracle="""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    description="tumbling 1-hour window aggregate over the event stream table",
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "events_sessionize",
    oracle="""
        WITH flagged AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                 CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                           > INTERVAL 30 MINUTE
                      OR lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sessions AS (
          SELECT user_id, ts, event_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    description="sessionization: 30-min inactivity gap via lag + cumulative sum",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # cast to double (not long): keeps sub-second precision so the 30-min
    # gap comparison agrees with the oracle's exact interval comparison
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = df.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    ).select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "n_events",
        "session_start",
        "session_end",
    )


# --- JSON functions -----------------------------------------------------------


@register(
    "json_extract_props",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
    description="JSON path extraction from a string column",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "events")
    return df.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k_value")
    )


@register(
    "events_view_to_purchase_30min",
    oracle="""
        SELECT l.user_id,
               l.ts AS first_ts,
               r.ts AS next_ts,
               CAST(date_diff('second', l.ts, r.ts) AS BIGINT) AS gap_seconds,
               r.value AS next_value
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND r.ts > l.ts
         AND r.ts <= l.ts + INTERVAL 30 MINUTE
        WHERE l.event_type = 'view' AND r.event_type = 'purchase'
    """,
    description="interval join (conversion attribution): purchases within "
    "30 min of a view per user — the batch twin of the stream-stream join "
    "in streaming/joins.py (same plan, watermark-bounded state when "
    "streaming)",
)
def events_view_to_purchase_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_agent_spark.plans.registry import events_table
    from data_pipeline_agent_spark.streaming.joins import followup_within

    return followup_within(
        events_table(spark, sf_dir), first_type="view", next_type="purchase",
        horizon="30 minutes",
    )


# --- data-quality validation report ------------------------------------------


@register(
    "validate_orders_expectations",
    oracle="""
        SELECT * FROM (
            SELECT 'nonpositive_totalprice' AS rule,
                   CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
                       AS n_violations
            FROM orders
            UNION ALL
            SELECT 'null_orderdate',
                   CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'duplicate_orderkey',
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'orphan_custkey',
                   CAST(count(*) AS BIGINT)
            FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        )
    """,
    description="data-quality expectations report over orders: positivity, "
    "non-null, key uniqueness, and referential integrity to customer — "
    "violation counts per rule in one pass plus one anti-join",
)
def validate_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingestion gate every pipeline needs before data flows on.
    Column rules (positivity, null, uniqueness) fuse into ONE aggregate
    pass over the fact table; referential integrity is one left-anti join
    against the dimension's keys (runtime-bloom-filter eligible). The
    report is rules-sized — nothing wide ever reaches the driver."""
    orders = table(spark, sf_dir, "orders")
    cust_keys = table(spark, sf_dir, "customer").select("c_custkey")
    scalars = orders.agg(
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("nonpos"),
        F.sum(F.col("o_orderdate").isNull().cast("long")).alias("nulldate"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dupkey"),
    )
    orphans = (
        orders.join(cust_keys, orders.o_custkey == cust_keys.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rules = scalars.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("nonpositive_totalprice").alias("rule"),
                    F.col("nonpos").cast("long").alias("n_violations"),
                ),
                F.struct(
                    F.lit("null_orderdate").alias("rule"),
                    F.col("nulldate").cast("long").alias("n_violations"),
                ),
                F.struct(
                    F.lit("duplicate_orderkey").alias("rule"),
                    F.col("dupkey").cast("long").alias("n_violations"),
                ),
            )
        ).alias("r")
    ).select("r.rule", "r.n_violations")
    orphan_row = orphans.select(
        F.lit("orphan_custkey").alias("rule"),
        F.col("n").cast("long").alias("n_violations"),
    )
    return rules.unionByName(orphan_row)


# --- snapshot diff (CDC-style) ------------------------------------------------


@register(
    "snapshot_diff_orders",
    oracle="""
        WITH old AS (
            SELECT o_orderkey, md5(concat_ws('|', o_orderstatus,
                       CAST(round(o_totalprice, 2) AS VARCHAR))) AS h
            FROM orders WHERE o_orderkey % 7 <> 0
        ),
        new AS (
            SELECT o_orderkey, md5(concat_ws('|', o_orderstatus,
                       CAST(round(o_totalprice, 2) AS VARCHAR))) AS h
            FROM orders WHERE o_orderkey % 5 <> 0
        )
        SELECT * FROM (
            SELECT 'added' AS change, CAST(count(*) AS BIGINT) AS n
            FROM new WHERE o_orderkey NOT IN (SELECT o_orderkey FROM old)
            UNION ALL
            SELECT 'removed', CAST(count(*) AS BIGINT)
            FROM old WHERE o_orderkey NOT IN (SELECT o_orderkey FROM new)
            UNION ALL
            SELECT 'unchanged', CAST(count(*) AS BIGINT)
            FROM old JOIN new USING (o_orderkey) WHERE old.h = new.h
        )
    """,
    description="CDC-style snapshot diff: added/removed/unchanged row "
    "counts between two deterministic order slices, compared by key plus "
    "a content hash of the tracked columns",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diffing without a transaction log: full-outer join on the
    key, change classified by null-side and a content hash over tracked
    columns (hash computed scan-side, so the join carries key+hash only —
    at 100 TB the shuffle is two narrow columns per snapshot, not the
    rows). The 1/7 and 1/5 slices stand in for yesterday/today."""
    orders = table(spark, sf_dir, "orders")
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice"), 2).cast("string"),
        )
    )
    old = orders.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", h.alias("h_old")
    )
    new = orders.where(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", h.alias("h_new")
    )
    j = old.join(new, "o_orderkey", "full_outer")
    return (
        j.select(
            F.when(F.col("h_old").isNull(), F.lit("added"))
            .when(F.col("h_new").isNull(), F.lit("removed"))
            .when(F.col("h_old") == F.col("h_new"), F.lit("unchanged"))
            .alias("change")
        )
        .where(F.col("change").isNotNull())
        .groupBy("change")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# One SQL text, two engines: the Spark plan IS the oracle string, executed
# via spark.sql over the registered temp views. Demonstrates the engine's
# SQL frontend surface (Catalyst parses/optimizes the same declarative
# text DuckDB verifies) — dialect-shared ANSI subset only.
_SQL_NATION_REVENUE = """
    SELECT n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 6) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


@register(
    "sql_nation_revenue",
    oracle=_SQL_NATION_REVENUE,
    description="SQL-frontend demo: the identical ANSI text runs as the "
    "Spark plan (spark.sql over temp views) and as its own DuckDB oracle — "
    "star join + aggregate through Catalyst's parser instead of the "
    "DataFrame API",
)
def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst treats parsed SQL and DataFrame lineage identically (same
    logical plan space, same optimizer rules), so this query inherits the
    broadcast-dim/AQE behavior of its DataFrame siblings for free. The
    view registration delegates to load_tables — one implementation of
    the events timestamp normalization, shared with every consumer."""
    from data_pipeline_agent_spark.session import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_SQL_NATION_REVENUE)


# "history cutoff": orders strictly before this date play the precomputed
# snapshot rollup; the rest arrive as the new batch
_ROLLUP_CUTOFF = "1997-01-01"


@register(
    "incremental_daily_rollup",
    oracle="""
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 6) AS revenue
        FROM orders
        GROUP BY 1
    """,
    description="incremental rollup maintenance: merge the history "
    "snapshot's partial aggregates with the new batch's partials by "
    "re-aggregation (sum-of-sums/sum-of-counts) instead of rescanning "
    "history; result equals the full recompute (the oracle)",
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-aggregate pattern: sums and counts are commutative
    monoids, so yesterday's per-day partials plus today's batch partials
    re-aggregate to the exact full answer — at 100 TB the daily job scans
    ONLY the new partition, never the history. The snapshot side here is
    simulated by aggregating the pre-cutoff slice; in production it is a
    stored table. AVG-style metrics must be carried as (sum, count) pairs
    — exactly what this plan stores."""
    orders = table(spark, sf_dir, "orders")

    def partials(df):
        # d formatted to string on both engines (date vs timestamp repr
        # drift was the round-1 cumulative_monthly_revenue lesson)
        return df.groupBy(
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("d")
        ).agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("o_totalprice").alias("prev"),
        )

    snap = partials(orders.where(F.col("o_orderdate") < _ROLLUP_CUTOFF))
    delta = partials(orders.where(F.col("o_orderdate") >= _ROLLUP_CUTOFF))
    return (
        snap.unionByName(delta)
        .groupBy("d")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            F.round(F.sum("prev"), 6).alias("revenue"),
        )
    )
