"""TPC-H-adapted relational queries q7–q22 over the trimmed testdata schema.

The testdata lacks ``partsupp`` and several TPC-H columns (shipmode,
supplycost, phone, comment), so each query is adapted to the available
columns while keeping the *shape* that matters for a distributed engine:
q7/q8/q9 are multi-way fact/dim joins with broadcast dimensions, q13 is an
outer-join + double aggregation, q15/q17 are decorrelated subqueries
(window max / per-group avg), q18 is a semi-join on an aggregated fact,
q19 an OR-of-conjuncts pushdown, q22 an anti-join against an aggregate
scalar.  All scale: the only shuffles are on join/agg keys of the fact
tables.

Broadcast policy (100 TB rule, tightened round 5): ``F.broadcast`` hints
are ONLY placed on *bounded* relations — ``nation``/``region``
(fixed-cardinality dims) and 1-row scalar aggregates.  EVERY SF-scaling
side (``customer``, ``supplier``, ``part`` — filtered or not) carries NO
hint: a fixed *fraction* of ``part`` (one type ≈ 1/25, a LIKE slice)
still scales linearly with SF, so at the 100 TB target (~SF 10^5) it is
tens of GB — over Spark's 8 GB broadcast hard limit, and a hard hint
bypasses AQE's size check, killing the query instead of degrading it.
At sf0.1 AQE still picks a broadcast join for all of these (they are
under the 64 MB ``autoBroadcastJoinThreshold`` set in session.py), while
at 1000 executors × 100 TB the same plan degrades gracefully to a
shuffle join.  Enforced registry-wide by
``tests/test_plans.py::test_hints_only_on_bounded_dims``.

The reference (/root/reference/main.py) has no joins at all (SURVEY.md §2.6)
— this whole module is north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_agent_spark.plans.registry import register, table


# --- Q7: volume between two nations by year ---------------------------------


@register(
    "q7_nation_volume",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 6) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7: bilateral shipping volume, two broadcast nation joins",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"),
                                  F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    # supplier/customer scale with SF — no broadcast hint; AQE decides.
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


# --- Q8: market share of one supplier nation within a region ----------------


@register(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                     / sum(volume), 6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region   ON n1.n_regionkey = r_regionkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
    """,
    description="TPC-H Q8: conditional market-share ratio over a 7-way star join",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # part filtered to one p_type is STILL ~1/25 of an SF-scaling table —
    # no hint (a hard hint would bypass AQE's 8 GB broadcast limit at
    # ~SF 10^5); AQE auto-broadcasts it while small, shuffles when not.
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# --- Q9: profit by supplier nation and year ---------------------------------


@register(
    "q9_profit_by_nation",
    oracle="""
        SELECT nation, o_year, round(sum(amount), 6) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS amount
            FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%bolt%'
        ) profit
        GROUP BY nation, o_year
    """,
    description="TPC-H Q9 (no partsupp: profit = disc. revenue) by nation x year",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(F.col("p_name").contains("bolt"))
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    # part's LIKE '%bolt%' slice is a fixed FRACTION of an SF-scaling
    # table — no hint (see module docstring); AQE decides at runtime.
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_profit")
        )
    )


# --- Q13: distribution of orders per customer -------------------------------


@register(
    "q13_order_distribution",
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    description="TPC-H Q13: outer join + double aggregation (count of counts)",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


# --- Q14: promotion revenue share -------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    description="TPC-H Q14: conditional ratio agg over broadcast part join",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    part = table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # part is unfiltered here (SF-scaling) — no forced broadcast; AQE
    # broadcasts it while it fits and shuffles when it doesn't.
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue")
        )
    )


# --- Q15: top supplier(s) by quarterly revenue ------------------------------


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    description="TPC-H Q15: scalar-subquery max decorrelated as a window max",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "total_revenue"
        )
    )
    # Decorrelate the scalar subquery as a 1-row max aggregate broadcast
    # against the revenue view (an unpartitioned window would drag the whole
    # per-supplier aggregate onto one partition).
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    top = revenue.join(F.broadcast(mx), revenue.total_revenue == mx.mx).drop("mx")
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(top), supp.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q17: small-quantity order revenue (correlated avg) ---------------------


@register(
    "q17_small_qty_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (
              SELECT 0.5 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey
          )
    """,
    description="TPC-H Q17: correlated per-part avg decorrelated as a window",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    # The correlated subquery averages over ALL lineitems of each part, but
    # only parts of Brand#13 can reach the final join — so prune lineitem
    # with a left-semi join on the filtered part keys BEFORE the window.
    # Per-part averages are unchanged (the window partitions by l_partkey
    # and the semi-join keeps whole partkey groups), while the window input
    # shrinks ~25× — the difference between shuffling 4 TB and 160 GB of
    # lineitem at the 100 TB scale point.  No hard broadcast hint even on
    # the key-only projection: a 1/25 slice of part scales with SF (see
    # module docstring) — AQE broadcasts the semi-join build side while it
    # fits, and the runtime-bloom semi-join recipe (bloom_semijoin_orders)
    # is the explicit pruning path when it no longer does.
    pk = part.select(F.col("p_partkey").alias("pk"))
    pruned = li.join(pk, li.l_partkey == F.col("pk"), "left_semi")
    w = Window.partitionBy("l_partkey")
    flagged = pruned.withColumn("avg_qty", F.avg("l_quantity").over(w))
    return (
        flagged.join(part, flagged.l_partkey == part.p_partkey)
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


# --- Q18: large-volume customers --------------------------------------------


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 6) AS sum_qty
        FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    description="TPC-H Q18: semi-join on aggregated fact (HAVING-IN), top-k",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 150)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    # customer scales with SF — no broadcast hint (AQE decides).
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --- Q19: bracketed discounted revenue (OR-of-conjuncts) --------------------


@register(
    "q19_bracket_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
    """,
    description="TPC-H Q19: OR-of-conjunct predicates across a broadcast join",
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    # Unfiltered part (SF-scaling) — no forced broadcast.
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "revenue"
        )
    )


# --- Q22: idle high-balance customers ---------------------------------------


@register(
    "q22_idle_customers",
    oracle="""
        SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
               CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c_acctbal), 6) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
                SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01'
              )
        GROUP BY c_nationkey
    """,
    description="TPC-H Q22: scalar-avg filter + anti-join, grouped by nation",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "Idle" = no orders since 2000 (every testdata customer has *some*
    # order, so the classic no-orders-ever predicate is degenerate here).
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2000-01-01"
    )
    # Scalar aggregate: one tiny job; its result parameterizes the main plan
    # (same inspect-then-rewrite shape as the reference's cleaning stats).
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
        .first()["a"]
    )
    return (
        cust.where(F.col("c_acctbal") > F.lit(avg_bal))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )
