"""Approximate-sketch queries — the extreme-scale path for statistics the
engine computes exactly elsewhere (A2 exact distinct counts,
O1/median exact percentiles; SURVEY.md §2.7a).

At 100 TB exact countDistinct is a full shuffle of the key universe and
exact percentile keeps whole groups in memory; HLL++ and GK-sketch
aggregates are single-pass, mergeable, and bounded-memory. These queries
emit BOTH the exact and the approximate value so the error is visible in
the result itself (and asserted in tests/test_sketches.py); they are
rows-only for the driver because DuckDB's sketch implementations don't
bit-match Spark's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_agent_spark.plans.registry import register, table
from data_pipeline_agent_spark.session import fan_out


@register(
    "approx_distinct_partkeys",
    description="HLL++ distinct vs exact: single-pass mergeable sketch (rsd 2%)",
)
def approx_distinct_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no fan_out: the agg partial-aggregates map-side and per-row work is a
    # hash update — repartitioning the full-width fact first costs 3-5x the
    # whole query (measured at sf0.1); at real scale the scan has splits
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").cast("long").alias("n_exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).cast("long").alias("n_approx"),
    ).select(
        "n_exact",
        "n_approx",
        F.round(F.abs(F.col("n_approx") - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


@register(
    "approx_percentiles_extendedprice",
    description="percentile_approx (GK sketch) vs exact percentile, p50/p99",
)
def approx_percentiles_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    # project to the one needed column before widening: exact percentile's
    # partial state is the value list, so parallel partials still help, but
    # shuffling 1 double instead of 16 columns makes the exchange ~free
    li = fan_out(table(spark, sf_dir, "lineitem").select("l_extendedprice"))
    exact = F.expr("percentile(l_extendedprice, array(0.5, 0.99))")
    approx = F.expr("percentile_approx(l_extendedprice, array(0.5, 0.99), 10000)")
    return li.agg(exact.alias("e"), approx.alias("a")).select(
        F.round(F.col("e").getItem(0), 6).alias("p50_exact"),
        F.round(F.col("a").getItem(0), 6).alias("p50_approx"),
        F.round(F.col("e").getItem(1), 6).alias("p99_exact"),
        F.round(F.col("a").getItem(1), 6).alias("p99_approx"),
    )


@register(
    "hll_users_by_type_union",
    description="datasketches HLL per event_type + lossless sketch-union total: "
    "the mergeable-sketch pattern for multi-level rollups at scale",
)
def hll_users_by_type_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users via HLL sketches, then a grand total computed
    by UNIONING THE SKETCHES (not re-scanning): the pattern that lets a
    100 TB pipeline maintain distinct-count rollups incrementally. Exact
    countDistinct emitted alongside so the error is visible/testable."""
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").cast("long").alias("n_exact"),
    )
    per_type_est = per_type.select(
        "event_type",
        "n_exact",
        F.hll_sketch_estimate("sk").cast("long").alias("n_approx"),
    )
    total = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("__ALL__").alias("event_type"),
        F.lit(None).cast("long").alias("n_exact"),
        F.hll_sketch_estimate("sk").cast("long").alias("n_approx"),
    )
    return per_type_est.unionByName(total)


@register(
    "cms_heavy_hitters_partkey",
    description="count_min_sketch heavy hitters: CMS estimates vs exact "
    "counts for the top-10 part keys (single-pass mergeable sketch; "
    "over-estimate-only error bounded in tests)",
)
def cms_heavy_hitters_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over l_partkey, probed at the exact top-10 keys.

    The CMS aggregate is one pass and mergeable (the 100 TB path for
    frequency rollups); probing uses the driver-side sketch (a few KB).
    CMS guarantees est >= exact and est <= exact + eps*N w.h.p. — both
    asserted in tests/test_sketches.py.
    """
    # no fan_out: both consumers are light-weight aggregates (count, CMS
    # update) that partial-aggregate map-side; see approx_distinct_partkeys
    li = table(spark, sf_dir, "lineitem")
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("l_partkey"))
        .limit(10)
    )
    sk_row = li.agg(
        F.expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42)").alias("sk")
    ).first()
    sketch = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row["sk"])
    )
    rows = [
        (r["l_partkey"], r["n_exact"], int(sketch.estimateCount(r["l_partkey"])))
        for r in top.collect()
    ]
    return spark.createDataFrame(
        rows, "l_partkey long, n_exact long, n_cms long"
    ).select(
        "l_partkey",
        "n_exact",
        "n_cms",
        (F.col("n_cms") - F.col("n_exact")).cast("long").alias("overcount"),
    )


@register(
    "bloom_semijoin_orders",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_matched,
               round(sum(o_totalprice), 6) AS total
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """,
    description="selective semi-join eligible for Spark's runtime Bloom "
    "prefilter (spark.sql.optimizer.runtime.bloomFilter.enabled, on by "
    "default): the build side's keys become a broadcast bloom filter probed "
    "in the fact scan before the join shuffle; result stays exact",
)
def bloom_semijoin_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB pre-filter pattern, the Spark-idiomatic way: a selective
    dim filter + semi-join lets Catalyst's InjectRuntimeFilter turn the dim
    keys into a Bloom filter (a few MB for millions of keys) that the fact
    scan probes BEFORE shuffling — ~all non-matching rows are dropped at
    the scan. False positives only cost shuffle bytes; the join keeps the
    result exact. Hand-rolling the same thing via a Python-UDF mightContain
    would move the probe off the JVM hot path, so we deliberately express
    the plan declaratively and let the optimizer place the filter.
    """
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(
            cust.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.round(F.sum("o_totalprice"), 6).alias("total"),
        )
    )


@register(
    "hll_trailing_7d_users",
    description="trailing-window distinct via sketch merge: per-day HLL "
    "sketches unioned over each trailing 7-day window — the incremental "
    "rollup pattern that answers ANY trailing window without rescanning "
    "events (rows-only: sketch estimates are engine-specific; error "
    "bound vs exact gated in tests)",
)
def hll_trailing_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily HLL sketches are built once (one shuffle on the day grain);
    each trailing window is then a SELF-JOIN of the days-sized sketch
    table (each day joins <= 7 rows) + hll_union_agg — events are never
    rescanned. At 100 TB the daily sketch table is a few KB per day and
    the trailing-window family (7d, 28d, 90d...) all derive from the
    same precomputed sketches; recomputing exact distincts per window
    would rescan the fact table once PER WINDOW SIZE."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    a = daily.select(F.col("day").alias("d"))
    b = daily.select(F.col("day").alias("d2"), "sk")
    return (
        a.join(b, (F.col("d2") >= F.date_sub(F.col("d"), 6)) & (F.col("d2") <= F.col("d")))
        .groupBy("d")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias(
                "n_users_7d_approx"
            ),
            F.count(F.lit(1)).cast("long").alias("n_days_merged"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_users_7d_approx",
            "n_days_merged",
        )
    )
