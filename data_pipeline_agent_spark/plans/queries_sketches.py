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


@register(
    "approx_distinct_partkeys",
    description="HLL++ distinct vs exact: single-pass mergeable sketch (rsd 2%)",
)
def approx_distinct_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    li = table(spark, sf_dir, "lineitem")
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
