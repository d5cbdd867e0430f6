"""Tests for distributed LSH-kNN SMOTE (ml/smote.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_pipeline_agent_spark.ml.smote import smote_oversample


def _imbalanced_df(spark):
    rng = random.Random(7)
    rows = [(rng.gauss(0.0, 1.0), rng.gauss(0.0, 1.0), 0.0) for _ in range(400)]
    rows += [(rng.gauss(8.0, 0.5), rng.gauss(8.0, 0.5), 1.0) for _ in range(40)]
    return spark.createDataFrame(rows, "x double, y double, label double")


def test_smote_balances_classes(spark):
    df = _imbalanced_df(spark)
    out = smote_oversample(df, "label", ["x", "y"], k=5)
    counts = {r["label"]: r["cnt"] for r in out.groupBy("label").agg(F.count("*").alias("cnt")).collect()}
    assert counts[0.0] == 400  # majority untouched
    # sampling is fraction-based, so "roughly" balanced (±25%)
    assert 300 <= counts[1.0] <= 500, counts


def test_smote_synthetics_stay_in_class_region(spark):
    df = _imbalanced_df(spark)
    out = smote_oversample(df, "label", ["x", "y"], k=5)
    # every synthetic is a convex combination of two minority points, so
    # it must lie inside the minority bounding box (minority ~ N(8, 0.5))
    stats = out.where(F.col("label") == 1.0).agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).first()
    assert stats[0] >= 5.0 and stats[1] <= 11.0
    assert stats[2] >= 5.0 and stats[3] <= 11.0


def test_smote_deterministic(spark):
    df = _imbalanced_df(spark)
    a = smote_oversample(df, "label", ["x", "y"], k=5).orderBy("x", "y").collect()
    b = smote_oversample(df, "label", ["x", "y"], k=5).orderBy("x", "y").collect()
    assert a == b


def test_smote_tiny_class_passthrough(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0)] * 10 + [(5.0, 5.0, 1.0)], "x double, y double, label double"
    )
    out = smote_oversample(df, "label", ["x", "y"], k=3)
    # a 1-row class has no neighbors: passthrough, caller falls back
    assert out.count() == 11
