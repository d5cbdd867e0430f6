"""TPC-H q2/q11/q12/q16/q20/q21 shapes adapted to the trimmed testdata.

With this module every one of the 22 TPC-H query *shapes* is covered
(q1/q3-q10/q13-q15/q17-q19/q22 live in queries_relational.py /
queries_tpch_extra.py / queries_windows.py). The testdata has no
``partsupp`` table and lineitem lacks shipmode/commitdate/receiptdate, so
the six queries here keep the original's *plan shape* — correlated-min
decorrelation (q2), group-vs-scalar-total threshold (q11), conditional
two-way counts (q12), distinct-count with supplier exclusion (q16),
correlated half-sum semi-join chain (q20), exists/not-exists sibling test
(q21) — over the columns that exist. Docstrings note each substitution.

Broadcast policy follows queries_tpch_extra.py: hints only on bounded
dims (nation/region); every SF-scaling side (customer, supplier, part,
aggregated fact views) is left to AQE's threshold so the same plan
degrades to a shuffle join instead of OOM-ing at 100 TB.

The reference (/root/reference/main.py) has no joins at all (SURVEY.md
§2.6) — this module is north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_agent_spark.plans.registry import register, table


# --- Q2: min-cost supplier per part (correlated min) -------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ),
        euro AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        candid AS (
            SELECT p_partkey, s_name, s_acctbal, n_name, unit_cost,
                   min(unit_cost) OVER (PARTITION BY p_partkey) AS best
            FROM part
              JOIN cost ON p_partkey = l_partkey
              JOIN euro ON l_suppkey = s_suppkey
            WHERE p_type = 'SMALL'
        )
        SELECT round(s_acctbal, 6) AS s_acctbal, s_name, n_name, p_partkey,
               round(unit_cost, 6) AS unit_cost
        FROM candid WHERE unit_cost = best
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    description="TPC-H Q2 shape: cheapest EUROPE supplier per SMALL part "
    "(no partsupp: unit cost = min shipped price/qty; correlated min "
    "decorrelated as a per-part window over the aggregated grain)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated `ps_supplycost = (SELECT min...)` subquery, with
    lineitem unit price standing in for supplycost (ref main.py has no
    joins; TPC-H spec shape). The window runs on the (part, supplier)
    aggregated grain — at most |part|x|supplier-per-part| rows, orders of
    magnitude below the fact table, so the partition-by-part shuffle is
    cheap at any SF."""
    li = table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    # nation/region are bounded dims -> broadcast; supplier scales -> AQE.
    euro = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    w = Window.partitionBy("p_partkey")
    cand = (
        part.join(cost, part.p_partkey == cost.l_partkey)
        .join(euro, cost.l_suppkey == euro.s_suppkey)
        .withColumn("best", F.min("unit_cost").over(w))
    )
    return (
        cand.where(F.col("unit_cost") == F.col("best"))
        .select(
            F.round("s_acctbal", 6).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q11: important parts by one nation's suppliers (scalar threshold) -------


@register(
    "q11_important_parts",
    oracle="""
        WITH v AS (
            SELECT l_partkey, sum(l_extendedprice) AS value
            FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey
        )
        SELECT l_partkey AS p_partkey, round(value, 6) AS value
        FROM v
        WHERE value > (SELECT sum(value) * 0.001 FROM v)
    """,
    description="TPC-H Q11 shape: per-part value for one nation's suppliers, "
    "kept when above a scalar fraction of the total (group agg + scalar "
    "subquery broadcast)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's HAVING > (SELECT sum(...) * fraction) over partsupp value,
    with shipped extendedprice standing in for supplycost*availqty. The
    scalar total is a 1-row aggregate broadcast-crossed against the
    per-part view — two passes over an already-aggregated frame, never a
    re-scan of the fact table."""
    nation = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem")
    v = (
        li.join(supp, li.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    v = v.persist()  # read twice: scalar total + threshold filter
    total = v.agg((F.sum("value") * 0.001).alias("thr"))
    out = (
        v.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"), F.round("value", 6).alias("value")
        )
    )
    return out


# --- Q12: priority counts by line status (conditional two-way counts) --------


@register(
    "q12_priority_by_status",
    oracle="""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
    """,
    description="TPC-H Q12 shape: high/low priority line counts grouped by "
    "l_linestatus (lineitem has no shipmode column; linestatus carries the "
    "same conditional-count plan)",
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --- Q16: supplier count by part attributes, excluding flagged suppliers -----


@register(
    "q16_supplier_counts",
    oracle="""
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part
          JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 7
          )
        GROUP BY p_brand, p_type, p_size
    """,
    description="TPC-H Q16 shape: distinct shipping suppliers per (brand, "
    "type, size), anti-joined against an excluded-supplier list (no "
    "partsupp: supply relation observed through lineitem; no comment "
    "column: the 'customer complaints' exclusion becomes a deterministic "
    "key predicate)",
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_suppkey") % 10 == 7)
    li = table(spark, sf_dir, "lineitem")
    # part filtered to 16% and projected to 4 cols; supplier exclusion is an
    # anti-join (scales: both sides shuffle on suppkey, no collected id list).
    return (
        li.select("l_partkey", "l_suppkey")
        .join(bad.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --- Q20: suppliers shipping above the per-part average (semi-join chain) ----


@register(
    "q20_excess_bolt_suppliers",
    oracle="""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
            FROM lineitem
              JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%bolt%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        ),
        excess AS (
            SELECT l_suppkey FROM (
                SELECT l_suppkey, qty,
                       avg(qty) OVER (PARTITION BY l_partkey) AS part_avg
                FROM shipped
            ) WHERE qty > 1.5 * part_avg
        )
        SELECT s_name, round(s_acctbal, 6) AS s_acctbal
        FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
          AND s_suppkey IN (SELECT l_suppkey FROM excess)
        ORDER BY s_name
    """,
    description="TPC-H Q20 shape: NATION_1 suppliers shipping >1.5x the "
    "per-part average of bolt parts in 1997 (no partsupp availqty: the "
    "correlated half-sum threshold becomes a per-part average over the "
    "aggregated (part, supplier) grain; same semi-join chain)",
)
def q20_excess_bolt_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested semi-join chain: supplier <- semi(excess shippers) with
    the threshold correlated per part. The window runs on the (part,
    supplier) aggregated grain, not the fact table, and the bolt filter
    prunes lineitem through a semi-join before the aggregation (no hard
    broadcast hint: the bolt slice is a fixed fraction of SF-scaling
    ``part`` — AQE broadcasts it while small, per the queries_tpch_extra
    module-docstring policy)."""
    part = table(spark, sf_dir, "part").where(F.col("p_name").contains("bolt"))
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    pk = part.select(F.col("p_partkey").alias("pk"))
    shipped = (
        li.join(pk, li.l_partkey == F.col("pk"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        shipped.withColumn("part_avg", F.avg("qty").over(w))
        .where(F.col("qty") > 1.5 * F.col("part_avg"))
        .select("l_suppkey")
    )
    nation = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(excess, supp.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 6).alias("s_acctbal"))
        .orderBy("s_name")
    )


# --- Q21: sole latest supplier on multi-supplier finished orders -------------


@register(
    "q21_sole_late_supplier",
    oracle="""
        WITH per AS (
            SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
            FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY 1, 2
        ),
        flagged AS (
            SELECT l_orderkey, l_suppkey, ms,
                   max(ms) OVER (PARTITION BY l_orderkey) AS omax,
                   count(*) OVER (PARTITION BY l_orderkey) AS n_supp
            FROM per
        ),
        at_max AS (
            SELECT *, CAST(sum(CASE WHEN ms = omax THEN 1 ELSE 0 END)
                           OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_at_max
            FROM flagged
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM at_max JOIN supplier ON l_suppkey = s_suppkey
        WHERE ms = omax AND n_supp > 1 AND n_at_max = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 20
    """,
    description="TPC-H Q21 shape: suppliers who were the SOLE latest shipper "
    "on multi-supplier finished orders (no receipt/commit dates: 'kept "
    "waiting' proxied by latest shipdate; the exists/not-exists sibling "
    "tests become window counts over the (order, supplier) grain)",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's pair of correlated EXISTS / NOT EXISTS against sibling
    lineitems is re-expressed as two window counts over the per-(order,
    supplier) max-shipdate grain: EXISTS(other supplier) == n_supp > 1,
    NOT EXISTS(other late supplier) == exactly one supplier at the order
    max. One shuffle to the aggregate grain, one window pass."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    per = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("ms"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per.withColumn("omax", F.max("ms").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_at_max",
            F.sum(F.when(F.col("ms") == F.col("omax"), 1).otherwise(0)).over(w),
        )
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        flagged.where(
            (F.col("ms") == F.col("omax"))
            & (F.col("n_supp") > 1)
            & (F.col("n_at_max") == 1)
        )
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
