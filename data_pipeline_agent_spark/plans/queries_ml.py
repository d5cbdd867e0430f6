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
