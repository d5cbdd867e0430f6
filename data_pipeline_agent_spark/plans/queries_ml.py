"""ML-layer queries. Model fitting is not ANSI-SQL-expressible, so these
are rows-only checks (no oracle twin) — the driver records row-count/schema
stability; exact contracts are covered by tests/test_ml.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_agent_spark.plans.registry import register, table


@register(
    "ml_feature_importance",
    oracle=None,
    description="RF feature importances for predicting l_extendedprice (rows-only: model fit)",
)
def ml_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single seeded RandomForest fit (no CV — the full tournament lives in
    ml/train.py and tests); returns the ranked importance table, the same
    artifact train_model persists (main.py:373-383)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    li = table(spark, sf_dir, "lineitem")
    feats = ["l_quantity", "l_discount", "l_tax", "l_partkey", "l_suppkey"]
    assembler = VectorAssembler(inputCols=feats, outputCol="features")
    rf = RandomForestRegressor(
        seed=42, numTrees=10, maxDepth=5, labelCol="label", featuresCol="features"
    )
    # importance ranks stabilize far below full data; a seeded sample is
    # the scale path for fit-for-insight (not fit-for-serving) models
    df = li.sample(fraction=0.25, seed=42).withColumn("label", F.col("l_extendedprice"))
    model = Pipeline(stages=[assembler, rf]).fit(df)
    imp = list(zip(feats, model.stages[-1].featureImportances.toArray()))
    imp.sort(key=lambda t: -t[1])
    return spark.createDataFrame(
        [(f, float(round(v, 6))) for f, v in imp], "feature string, importance double"
    )


@register(
    "ml_class_balance_report",
    oracle="""
        WITH k AS (SELECT count(*) AS n, count(DISTINCT o_orderstatus) AS nc FROM orders)
        SELECT o_orderstatus AS label,
               CAST(count(*) AS BIGINT) AS cnt,
               round(count(*) / n, 6) AS frac,
               (min(count(*)) OVER () / (max(count(*)) OVER () * 1.0)) < 0.2 AS imbalanced
        FROM orders, k GROUP BY o_orderstatus, n
    """,
    description="M6 imbalance detection: per-class counts + min/max<0.2 flag",
)
def ml_class_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    df = table(spark, sf_dir, "orders")
    n = df.count()
    counts = df.groupBy(F.col("o_orderstatus").alias("label")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy()
    return counts.select(
        "label",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") / F.lit(n), 6).alias("frac"),
        (
            F.min("cnt").over(w) / (F.max("cnt").over(w) * F.lit(1.0)) < 0.2
        ).alias("imbalanced"),
    )


@register(
    "ml_als_recommend_parts",
    oracle=None,
    description="ALS implicit-feedback recommender: top-3 unseen parts per "
    "probe customer from (custkey, partkey, qty) interactions (rows-only: "
    "iterative factorization; ranking determinism gated in tests)",
)
def ml_als_recommend_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix factorization at Spark scale: MLlib ALS is the canonical
    distributed recommender (block-partitioned normal equations, no
    driver-side matrix). Interactions come from the order history —
    customer x part with summed quantity as implicit confidence.

    Scale notes: the interaction aggregate is one shuffle on (cust, part);
    ALS itself alternates block solves partitioned by user/item block —
    both sides stay distributed. recommendForUserSubset scores only the
    5-customer probe set (never the full cross product). rank/maxIter are
    deliberately small: quality saturates fast on implicit data and the
    fit is the only iterative stage in the query."""
    from pyspark.ml.recommendation import ALS

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    inter = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").cast("int").alias("cust"),
            F.col("l_partkey").cast("int").alias("part"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("qty"))
    )
    als = ALS(
        rank=8,
        maxIter=5,
        seed=42,
        implicitPrefs=True,
        alpha=1.0,
        regParam=0.1,
        userCol="cust",
        itemCol="part",
        ratingCol="qty",
        coldStartStrategy="drop",
    )
    model = als.fit(inter)
    probe = inter.select("cust").distinct().orderBy("cust").limit(5)
    recs = model.recommendForUserSubset(probe, 3)
    return recs.select(
        F.col("cust").cast("long").alias("custkey"),
        F.posexplode("recommendations").alias("rk0", "rec"),
    ).select(
        "custkey",
        (F.col("rk0") + 1).cast("long").alias("rk"),
        F.col("rec.part").cast("long").alias("partkey"),
        F.round(F.col("rec.rating"), 4).alias("score"),
    )
