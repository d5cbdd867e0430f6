"""train_model tournament tests on FIXTURES.md-style frames. Metric parity
with the reference is tolerance-band (split membership differs, SURVEY
§2.7⚠h); contracts (metric keys, error text, importance artifacts) are
exact."""

import math
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_agent_spark.ml.train import (
    oversample_minority,
    resolve_target,
    stratified_split,
    train_model,
)


@pytest.fixture(scope="module")
def clf_df(spark):
    # F2-style: separable 2-class problem, 85/15 imbalance-ish
    import random

    rng = random.Random(42)
    rows = []
    for i in range(400):
        cls = 1 if rng.random() < 0.25 else 0
        mu = 2.0 if cls else -2.0
        rows.append(
            (float(rng.gauss(mu, 1)), float(rng.gauss(mu, 1)), float(rng.gauss(0, 1)), cls)
        )
    return spark.createDataFrame(rows, "f1 double, f2 double, f3 double, churn int")


@pytest.fixture(scope="module")
def reg_df(spark):
    import random

    rng = random.Random(42)
    rows = []
    for i in range(400):
        sqft = rng.uniform(500, 4000)
        price = 50_000 + 120 * sqft + rng.gauss(0, 20_000)
        rows.append((float(sqft), float(rng.uniform(1, 6)), float(price)))
    return spark.createDataFrame(rows, "sqft double, bedrooms double, price double")


def test_resolve_target_exact_fuzzy_error():
    cols = ["age", "income", "label_col"]
    assert resolve_target(cols, "AGE ") == "age"
    assert resolve_target(cols, "label") == "label_col"  # substring fallback
    with pytest.raises(ValueError, match="not found"):
        resolve_target(cols, "nope")


def test_stratified_split_proportions(spark, clf_df):
    labeled = clf_df.withColumn("label", F.col("churn").cast("double"))
    train, test = stratified_split(labeled, "label")
    tr = {r[0]: r[1] for r in train.groupBy("label").count().collect()}
    te = {r[0]: r[1] for r in test.groupBy("label").count().collect()}
    for cls in tr:
        frac = te[cls] / (tr[cls] + te[cls])
        assert 0.15 < frac < 0.25, f"class {cls} test fraction {frac}"


def test_stratified_split_sampled_path(spark, clf_df):
    """Above STRATIFIED_EXACT_CUTOFF the split switches to seeded Bernoulli
    (the per-class percent_rank sort is a single-reducer bottleneck at
    scale). Forced here via fake class_counts: rows must partition cleanly
    (disjoint, covering) and the per-class test fraction must be binomial-
    plausible — wide tolerance, 400 rows is small for a Bernoulli draw."""
    labeled = clf_df.withColumn("label", F.col("churn").cast("double"))
    big = {0.0: 20_000_001, 1.0: 20_000_001}  # force the sampled branch
    train, test = stratified_split(labeled, "label", class_counts=big)
    n_total = labeled.count()
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == n_total
    assert train.intersect(test).count() == 0
    assert 0.10 < n_test / n_total < 0.32


def test_oversample_balances(spark, clf_df):
    labeled = clf_df.withColumn("label", F.col("churn").cast("double"))
    out = oversample_minority(labeled, "label")
    cc = {r[0]: r[1] for r in out.groupBy("label").count().collect()}
    assert min(cc.values()) / max(cc.values()) > 0.9


def test_train_classification_contract(spark, clf_df, tmp_path):
    path, metric, imp = train_model(clf_df, "churn", model_dir=str(tmp_path))
    assert set(metric) == {
        "Model", "Accuracy", "Precision", "Recall", "F1 Score", "Imbalanced", "Classes",
    }
    assert metric["Classes"] == 2
    assert metric["F1 Score"] > 0.85  # separable problem must be learnable
    assert os.path.isdir(path)  # MLlib artifact dir
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)  # round-trips
    assert loaded.transform(clf_df.na.fill(0)).count() == clf_df.count()
    if metric["Model"] in ("RandomForest", "GradientBoosting"):
        assert imp is not None and "<table" in imp
        assert os.path.exists(os.path.join(str(tmp_path), "churn_feature_importance.csv"))


def test_train_regression_contract(spark, reg_df, tmp_path):
    path, metric, imp = train_model(reg_df, "price", model_dir=str(tmp_path))
    assert set(metric) == {"Model", "MSE", "MAE", "R2"}
    assert metric["R2"] > 0.9  # linear-ish problem
    assert not math.isnan(metric["MSE"])


def test_no_numeric_features_error(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "name string, label string"
    )
    with pytest.raises(ValueError, match="No numeric columns"):
        train_model(df, "label")


def test_train_numeric_categorical_labels(spark, tmp_path):
    """Arbitrary numeric class codes ({-1, 5, 9}) must train: MLlib
    classifiers need labels in [0, numClasses), so the trainer dense-maps
    numeric categorical targets to 0..k-1 (sklearn LabelEncoder order,
    /root/reference/main.py:228-230). Raw codes would crash RF/LR and
    inflate the inferred class count."""
    import random

    rng = random.Random(7)
    codes = [-1, 5, 9]
    rows = []
    for _ in range(300):
        cls = rng.randrange(3)
        mu = [-3.0, 0.0, 3.0][cls]
        rows.append((float(rng.gauss(mu, 0.8)), float(rng.gauss(mu, 0.8)), codes[cls]))
    df = spark.createDataFrame(rows, "f1 double, f2 double, grade int")
    path, metric, _ = train_model(df, "grade", model_dir=str(tmp_path))
    assert metric["Classes"] == 3
    assert metric["F1 Score"] > 0.8
    assert os.path.isdir(path)


def test_als_recommendations_contract(spark):
    """ALS recommender (full-value helper): 3 ranked, distinct, UNSEEN
    parts for each of the 5 probe customers; scores non-increasing within
    a customer (the rk column must reflect the score order)."""
    from data_pipeline_agent_spark.plans.queries_ml import _als_recommendations
    from tests.conftest import SF_DIR

    recs_df, inter = _als_recommendations(spark, SF_DIR)
    recs = recs_df.collect()
    assert len(recs) == 15
    by_cust = {}
    for r in recs:
        by_cust.setdefault(r.custkey, []).append(r)
    assert len(by_cust) == 5
    part_ids = {
        row.p_partkey
        for row in spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_partkey").collect()
    }
    seen = {(r.cust, r.part) for r in inter.select("cust", "part").collect()}
    for cust, rows in by_cust.items():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == [1, 2, 3]
        assert len({r.partkey for r in rows}) == 3
        assert all(r.partkey in part_ids for r in rows)
        assert all((r.custkey, r.partkey) not in seen for r in rows)
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_als_fixed_seed_stability(spark):
    """Two independent fits with the same seed must recommend the same
    ranked part list per probe customer (seeded block init makes MLlib
    ALS deterministic under a fixed session/partitioning) — the property
    that keeps the registry entry's contract-hash rows stable."""
    from data_pipeline_agent_spark.plans.queries_ml import _als_recommendations
    from tests.conftest import SF_DIR

    def ranked(rows):
        out = {}
        for r in rows:
            out.setdefault(r["custkey"], []).append((r["rk"], r["partkey"]))
        return {k: sorted(v) for k, v in out.items()}

    a = ranked(_als_recommendations(spark, SF_DIR)[0].collect())
    b = ranked(_als_recommendations(spark, SF_DIR)[0].collect())
    assert a == b, "same-seed ALS fits diverged"
    assert len(a) == 5 and all(len(v) == 3 for v in a.values())


def test_ml_contract_queries_all_true(spark):
    """The r5 contract-oracle conversions: every in-row boolean in the
    ml_als_recommend_parts / ml_feature_importance registry outputs must
    be genuinely TRUE (the oracle side emits literal TRUEs, so a single
    FALSE is a driver hash mismatch)."""
    from data_pipeline_agent_spark.plans import REGISTRY
    from tests.conftest import SF_DIR

    als = REGISTRY["ml_als_recommend_parts"].spark(spark, SF_DIR).collect()
    assert len(als) == 15
    assert sorted({r.rk for r in als}) == [1, 2, 3]
    assert all(
        r.in_part_domain_ok and r.unseen_ok and r.scores_desc_ok for r in als
    )

    imp = REGISTRY["ml_feature_importance"].spark(spark, SF_DIR).collect()
    assert sorted(r.feature for r in imp) == sorted(
        ["l_quantity", "l_discount", "l_tax", "l_partkey", "l_suppkey"]
    )
    assert all(
        r.importance_nonneg_ok and r.not_all_equal_ok and r.sum_to_one_ok
        for r in imp
    )


def test_importance_contract_discriminates_degenerate_fit():
    """r5 verdict finding 1: the contract booleans must NOT hold for every
    syntactically valid MLlib vector. A constant 1/n vector (the
    degenerate-fit signature — zero effective trees / identical splits)
    must flip not_all_equal_ok; a negative or non-normalized vector flips
    the other two. A real near-uniform fit (separations >> 1e-9) passes."""
    from data_pipeline_agent_spark.plans.queries_ml import (
        RF_FEATURES,
        _importance_contract_rows,
    )

    degenerate = [(f, 1.0 / len(RF_FEATURES)) for f in RF_FEATURES]
    assert all(not r[2] for r in _importance_contract_rows(degenerate)), (
        "constant-vector fit must turn not_all_equal_ok FALSE"
    )

    negative = list(degenerate)
    negative[0] = (RF_FEATURES[0], -0.2)
    rows = _importance_contract_rows(negative)
    assert any(not r[1] for r in rows), "negative importance must flip nonneg"
    assert all(not r[3] for r in rows), "sum != 1 must flip sum_to_one_ok"

    realish = [(f, v) for f, v in zip(RF_FEATURES, [0.21, 0.2, 0.2, 0.2, 0.19])]
    rows = _importance_contract_rows(realish)
    assert all(r[1] and r[2] and r[3] for r in rows)


def test_multiclass_gbt_family_is_ovr(spark):
    """⚠j closure: binary targets get a bare GBTClassifier, multiclass an
    OneVsRest wrapper; grids keyed on the inner GBT must survive copy()
    (the mechanism CrossValidator uses to apply param maps). Takes the
    spark fixture because constructing a JavaParams estimator needs an
    active SparkContext."""
    from pyspark.ml.classification import GBTClassifier, OneVsRest

    from data_pipeline_agent_spark.ml.train import _classifier_families

    fams2 = {n: e for n, e, _g in _classifier_families(None, 2)}
    fams3 = {n: e for n, e, _g in _classifier_families(None, 3)}
    assert [n for n, _e, _g in _classifier_families(None, 3)] == [
        "RandomForest",
        "GradientBoosting",
        "LogisticRegression",
    ], "reference family order (main.py:272-282) must hold for multiclass too"
    assert isinstance(fams2["GradientBoosting"], GBTClassifier)
    ovr = fams3["GradientBoosting"]
    assert isinstance(ovr, OneVsRest)
    inner = ovr.getClassifier()
    copied = ovr.copy({inner.maxIter: 7, inner.stepSize: 0.05})
    assert copied.getClassifier().getOrDefault(inner.maxIter) == 7
    assert copied.getClassifier().getOrDefault(inner.stepSize) == 0.05


def test_ovr_gbt_trains_multiclass(spark):
    """End-to-end OvR-GBT mechanics on a tiny separable 3-class frame
    (maxIter=5 so this stays seconds, not the tournament's full grid):
    fits, predicts all 3 classes, and exposes per-class importances for
    the mean-aggregated importance artifact."""
    import random

    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier, OneVsRest
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    rng = random.Random(3)
    rows = []
    for _ in range(120):
        cls = rng.randrange(3)
        mu = [-4.0, 0.0, 4.0][cls]
        rows.append((float(rng.gauss(mu, 0.5)), float(rng.gauss(mu, 0.5)), cls))
    df = spark.createDataFrame(rows, "f1 double, f2 double, label int").withColumn(
        "label", F.col("label").cast("double")
    )
    gbt = GBTClassifier(maxIter=5, seed=42, labelCol="label", featuresCol="scaled")
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=["f1", "f2"], outputCol="features"),
            StandardScaler(inputCol="features", outputCol="scaled", withMean=True, withStd=True),
            OneVsRest(classifier=gbt, labelCol="label", featuresCol="scaled"),
        ]
    )
    model = pipe.fit(df)
    pred = model.transform(df)
    assert {r["prediction"] for r in pred.select("prediction").distinct().collect()} == {
        0.0,
        1.0,
        2.0,
    }
    per_class = [m.featureImportances.toArray() for m in model.stages[-1].models]
    assert len(per_class) == 3
    agg = sum(per_class) / 3
    assert agg.shape == (2,) and abs(float(agg.sum()) - 1.0) < 1e-6
