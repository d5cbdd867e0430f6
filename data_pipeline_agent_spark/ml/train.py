"""Model-training tournament — reference parity for ``train_model``
(/root/reference/main.py:194-385), rebuilt on MLlib Pipelines.

Contract replicated exactly:
- column-name normalization strip().lower() + fuzzy substring target
  resolution with the reference's error text (main.py:200-211)
- numeric-only features, null->0 (main.py:213-218); "No numeric columns
  found for training." when empty (main.py:221)
- task heuristic: string target OR nunique<20 -> classification
  (main.py:225); string targets label-encoded alphabetically
- imbalance test min/max < 0.2 (main.py:232-238); balanced class weights
  + oversampling (SMOTE surrogate, same try/except fallback shape,
  main.py:250-262)
- 3-fold CV grid search per family, winner by TEST-set score with
  strict-improvement tie-break in family order (main.py:284-301)
- metric dicts with the exact reference keys (main.py:310-318,359-364)
- feature-importance CSV + top-10 HTML for tree winners (main.py:373-383)

Documented deviations (SURVEY.md §2.7 ⚠h/⚠i/⚠j): split membership is
Spark-random (metric parity is tolerance-band, not bitwise);
max_depth=None -> maxDepth=30 (MLlib cap); MLlib's GBTClassifier is
binary-only, so multiclass targets get it one-vs-rest (K binary GBTs —
the same per-boosting-stage tree count sklearn's native multiclass GBT
fits, main.py:272-282) with per-class importances averaged for the
importance artifact.
"""

from __future__ import annotations

import os

from pyspark.ml import Pipeline
from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    OneVsRest,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.ml.regression import (
    GBTRegressor,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

SEED = 42
MAX_DEPTH_UNBOUNDED = 30  # MLlib cap standing in for sklearn max_depth=None


def resolve_target(columns: list[str], target_col: str) -> str:
    """Exact match, else first column containing the target as substring,
    else ValueError listing columns (main.py:203-211)."""
    target_col = target_col.strip().lower()
    if target_col in columns:
        return target_col
    similar = [c for c in columns if target_col in c]
    if similar:
        return similar[0]
    raise ValueError(
        f"Target column '{target_col}' not found.\nAvailable columns: {columns}"
    )


# Above this many rows in the LARGEST class, stratified_split abandons the
# exact percent_rank path: percent_rank needs each class partition fully
# sorted on one reducer (no WindowGroupLimit applies — every row keeps its
# rank), so the cutoff bounds that single-reducer sort exactly the way
# LABEL_ENCODE_BROADCAST_CUTOFF bounds the code-table window.
STRATIFIED_EXACT_CUTOFF = 10_000_000


def stratified_split(
    df: DataFrame,
    label_col: str,
    test_frac: float = 0.2,
    seed: int = SEED,
    class_counts: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stratified 80/20 with a bounded-exact / sampled-at-scale switch.

    Exact path (largest class <= STRATIFIED_EXACT_CUTOFF rows): per-class
    percent_rank over a seeded random order — one shuffle, exact per-class
    proportions, no driver-side row movement. Beyond the cutoff the
    per-class sort is a single-reducer bottleneck (class count is bounded
    ~20 by the task heuristic, so class size scales with the corpus), and
    the split switches to seeded per-row Bernoulli assignment — the same
    mechanism as ``randomSplit``, stratified automatically because every
    class draws from the same uniform: per-class proportion error is
    O(1/sqrt(n)), ~1e-4 where the cutoff forces the switch, far below the
    tolerance-band metric parity ⚠h already grants the split.

    The scored frame is eagerly localCheckpointed BEFORE the two filters:
    both paths derive ``__pr`` from ``F.rand(seed)``, whose draw depends
    on intra-partition row order — re-evaluating it in the train plan and
    again in the test plan can disagree when lineage contains shuffles/
    joins and AQE or task retries reorder rows, putting a row in BOTH
    splits (silent leakage) or neither. (``randomSplit`` guards the same
    hazard by sorting each partition; materializing once is cheaper than
    a per-partition full-column sort and the split frame is the curated
    training table, far smaller than the corpus.)
    """
    if class_counts is None:
        class_counts = {r[0]: r[1] for r in df.groupBy(label_col).count().collect()}
    largest = max(class_counts.values(), default=0)
    if largest <= STRATIFIED_EXACT_CUTOFF:
        w = Window.partitionBy(label_col).orderBy(F.rand(seed))
        ranked = df.withColumn("__pr", F.percent_rank().over(w))
    else:
        ranked = df.withColumn("__pr", F.rand(seed))
    ranked = ranked.localCheckpoint(eager=True)
    train = ranked.where(F.col("__pr") < 1 - test_frac).drop("__pr")
    test = ranked.where(F.col("__pr") >= 1 - test_frac).drop("__pr")
    return train, test


def oversample_minority(df: DataFrame, label_col: str, seed: int = SEED) -> DataFrame:
    """SMOTE surrogate (v1): per-class random oversampling with replacement
    up to the majority count. Distributed (per-partition sampling), no
    driver collection of rows; statistically close to SMOTE for the model
    families in the tournament. The reference silently falls back when
    SMOTE fails (main.py:258-260) — same shape here."""
    counts = {r[0]: r[1] for r in df.groupBy(label_col).count().collect()}
    if not counts:
        return df
    max_count = max(counts.values())
    out = df
    for cls, cnt in counts.items():
        extra = max_count - cnt
        if extra <= 0:
            continue
        frac = extra / cnt
        out = out.unionAll(
            df.where(F.col(label_col) == cls).sample(
                withReplacement=True, fraction=frac, seed=seed
            )
        )
    return out


def _classifier_families(weight_col: str | None, n_classes: int):
    """(name, estimator, grid) in reference order (main.py:272-282)."""
    kw = {"weightCol": weight_col} if weight_col else {}
    rf = RandomForestClassifier(seed=SEED, labelCol="label", featuresCol="scaled", **kw)
    gbt = GBTClassifier(seed=SEED, labelCol="label", featuresCol="scaled")
    lr = LogisticRegression(maxIter=1000, labelCol="label", featuresCol="scaled", **kw)
    fams = [
        (
            "RandomForest",
            rf,
            ParamGridBuilder()
            .addGrid(rf.numTrees, [50, 100])
            .addGrid(rf.maxDepth, [MAX_DEPTH_UNBOUNDED, 10, 20])
            .build(),
        ),
    ]
    # MLlib GBTClassifier is binary-only; multiclass goes one-vs-rest
    # (K binary GBTs — the same K-trees-per-boosting-stage cost sklearn's
    # native multiclass GBT pays, main.py:272-282). The grid still keys on
    # the INNER gbt params: OneVsRest.copy(extra) forwards extras to its
    # classifier, so CrossValidator's param maps reach the GBT (⚠j).
    gbt_est = (
        gbt
        if n_classes == 2
        else OneVsRest(
            classifier=gbt, labelCol="label", featuresCol="scaled", parallelism=4
        )
    )
    fams.append(
        (
            "GradientBoosting",
            gbt_est,
            ParamGridBuilder()
            .addGrid(gbt.maxIter, [50, 100])
            .addGrid(gbt.stepSize, [0.01, 0.1])
            .build(),
        )
    )
    fams.append(
        (
            "LogisticRegression",
            lr,
            # sklearn C is inverse regularization; regParam = 1/C
            ParamGridBuilder().addGrid(lr.regParam, [10.0, 1.0, 0.1]).build(),
        )
    )
    return fams


def _regressor_families():
    rf = RandomForestRegressor(seed=SEED, labelCol="label", featuresCol="scaled")
    gbt = GBTRegressor(seed=SEED, labelCol="label", featuresCol="scaled")
    lin = LinearRegression(labelCol="label", featuresCol="scaled")
    return [
        (
            "RandomForest",
            rf,
            ParamGridBuilder()
            .addGrid(rf.numTrees, [50, 100])
            .addGrid(rf.maxDepth, [MAX_DEPTH_UNBOUNDED, 10, 20])
            .build(),
        ),
        (
            "GradientBoosting",
            gbt,
            ParamGridBuilder()
            .addGrid(gbt.maxIter, [50, 100])
            .addGrid(gbt.stepSize, [0.01, 0.1])
            .build(),
        ),
        ("LinearRegression", lin, ParamGridBuilder().build()),
    ]


def train_model(
    df: DataFrame,
    target_col: str,
    model_dir: str = "models",
    cv_parallelism: int = 4,
) -> tuple[str, dict, str | None]:
    """Returns (model_path, metric_dict, importance_html_or_None)."""
    df = df.toDF(*[c.strip().lower() for c in df.columns])
    target = resolve_target(df.columns, target_col)

    # --- features: numeric non-target cols, null->0 (main.py:213-218) ---
    num_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name != target
    ]
    if not num_cols:
        raise ValueError("No numeric columns found for training.")
    feat = df.na.fill(0, subset=num_cols)

    # --- task heuristic (main.py:223-230) --------------------------------
    target_is_string = isinstance(feat.schema[target].dataType, StringType)
    n_distinct = feat.agg(F.count_distinct(target)).first()[0]
    is_classification = target_is_string or n_distinct < 20

    label_classes: list | None = None  # index -> original value (reporting)
    if is_classification and target_is_string:
        feat = (
            StringIndexer(
                inputCol=target, outputCol="label", stringOrderType="alphabetAsc"
            )
            .fit(feat)
            .transform(feat)
        )
    elif is_classification:
        # Numeric categorical target: MLlib classifiers require labels in
        # [0, numClasses) — raw codes like {-1, 1} crash the fit and sparse
        # codes like {1, 5, 9} inflate the inferred class count.  Dense-map
        # to 0..k-1 in ascending numeric order (sklearn LabelEncoder's
        # order for numbers, /root/reference/main.py:228-230).  k < 20 by
        # the task heuristic, so the distinct-collect and when-chain are
        # bounded.
        label_classes = sorted(
            r[0] for r in feat.select(target).where(F.col(target).isNotNull()).distinct().collect()
        )
        expr = None
        for i, v in enumerate(label_classes):
            expr = (
                F.when(F.col(target) == v, float(i))
                if expr is None
                else expr.when(F.col(target) == v, float(i))
            )
        feat = feat.withColumn("label", expr)
    else:
        feat = feat.withColumn("label", F.col(target).cast("double"))

    # --- imbalance + weights (main.py:232-252) ----------------------------
    is_imbalanced = False
    weight_col = None
    n_classes = int(n_distinct)
    if is_classification:
        cc = {r[0]: r[1] for r in feat.groupBy("label").count().collect()}
        n_classes = len(cc)
        is_imbalanced = min(cc.values()) / max(cc.values()) < 0.2
        if is_imbalanced:
            n, k = sum(cc.values()), len(cc)
            expr = None
            for cls, cnt in cc.items():
                w = n / (k * cnt)
                expr = (
                    F.when(F.col("label") == cls, F.lit(w))
                    if expr is None
                    else expr.when(F.col("label") == cls, F.lit(w))
                )
            feat = feat.withColumn("__weight", expr)
            weight_col = "__weight"

    # --- split (main.py:241, ⚠h) ------------------------------------------
    if is_classification:
        train, test = stratified_split(feat, "label", class_counts=cc)
    else:
        train, test = feat.randomSplit([0.8, 0.2], seed=SEED)

    # --- oversampling for imbalance (main.py:253-262) ---------------------
    # SMOTE first (LSH-kNN synthetics, ml/smote.py), then random
    # oversampling, then unresampled — the reference's silent-fallback
    # chain (SMOTE -> unresampled) with one extra rung.
    if is_classification and is_imbalanced:
        try:
            from data_pipeline_agent_spark.ml.smote import smote_oversample

            # returns originals + synthetics over (num_cols, label); the
            # data is now balanced so the class weights become uniform
            # (the reference's weight dict is likewise unused once SMOTE
            # succeeds, main.py:250-262)
            train_fit = smote_oversample(train, "label", num_cols)
            if weight_col is not None:
                train_fit = train_fit.withColumn(weight_col, F.lit(1.0))
        except Exception:
            try:
                train_fit = oversample_minority(train, "label")
            except Exception:
                train_fit = train  # reference's silent fallback shape
    else:
        train_fit = train
    train_fit = train_fit.cache()
    test = test.cache()

    # --- shared stages: assemble + scale (main.py:244-246) ----------------
    assembler = VectorAssembler(inputCols=num_cols, outputCol="features")
    scaler = StandardScaler(
        inputCol="features", outputCol="scaled", withMean=True, withStd=True
    )

    if is_classification:
        tune_eval = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="f1"
        )
        families = _classifier_families(weight_col, n_classes)
        better = lambda s, best: s > best  # noqa: E731
        best_score = 0.0  # strict > keeps the earliest family on ties
    else:
        tune_eval = RegressionEvaluator(
            labelCol="label", predictionCol="prediction", metricName="mse"
        )
        families = _regressor_families()
        better = lambda s, best: s < best  # noqa: E731
        best_score = float("inf")

    best_model, best_name = None, ""
    for name, estimator, grid in families:
        pipe = Pipeline(stages=[assembler, scaler, estimator])
        if grid:
            cv = CrossValidator(
                estimator=pipe,
                estimatorParamMaps=grid,
                evaluator=tune_eval,
                numFolds=3,
                seed=SEED,
                parallelism=cv_parallelism,
            )
            fitted = cv.fit(train_fit).bestModel
        else:
            fitted = pipe.fit(train_fit)
        score = tune_eval.evaluate(fitted.transform(test))
        if better(score, best_score):
            best_score, best_model, best_name = score, fitted, name

    if best_model is None:
        raise ValueError("Model tournament produced no usable model.")

    # --- final metrics (main.py:303-318, 353-364) --------------------------
    pred = best_model.transform(test)
    if is_classification:
        ev = MulticlassClassificationEvaluator(labelCol="label", predictionCol="prediction")
        metric = {
            "Model": best_name,
            "Accuracy": float(ev.evaluate(pred, {ev.metricName: "accuracy"})),
            "Precision": float(ev.evaluate(pred, {ev.metricName: "weightedPrecision"})),
            "Recall": float(ev.evaluate(pred, {ev.metricName: "weightedRecall"})),
            "F1 Score": float(ev.evaluate(pred, {ev.metricName: "f1"})),
            "Imbalanced": bool(is_imbalanced),
            "Classes": int(n_classes),
        }
    else:
        ev = RegressionEvaluator(labelCol="label", predictionCol="prediction")
        metric = {
            "Model": best_name,
            "MSE": float(ev.evaluate(pred, {ev.metricName: "mse"})),
            "MAE": float(ev.evaluate(pred, {ev.metricName: "mae"})),
            "R2": float(ev.evaluate(pred, {ev.metricName: "r2"})),
        }

    # --- persistence (main.py:366-371): one MLlib artifact dir -------------
    os.makedirs(model_dir, exist_ok=True)
    model_path = os.path.join(model_dir, f"{target}_model")
    best_model.write().overwrite().save(model_path)

    # --- feature importance (main.py:373-383) ------------------------------
    final_stage = best_model.stages[-1]
    importance_html = None
    imp_vec = None
    if hasattr(final_stage, "featureImportances"):
        imp_vec = final_stage.featureImportances.toArray()
    elif hasattr(final_stage, "models"):
        # OneVsRestModel (multiclass GBT): mean of the per-class binary
        # models' importances — the same uniform aggregation sklearn's
        # native multiclass GBT applies across its K-trees-per-stage
        per_class = [
            m.featureImportances.toArray()
            for m in final_stage.models
            if hasattr(m, "featureImportances")
        ]
        if per_class:
            imp_vec = sum(per_class) / len(per_class)
    if imp_vec is not None:
        imp = list(zip(num_cols, imp_vec))
        imp.sort(key=lambda t: -t[1])
        import pandas as pd

        imp_df = pd.DataFrame(imp, columns=["Feature", "Importance"])
        imp_df.to_csv(os.path.join(model_dir, f"{target}_feature_importance.csv"), index=False)
        importance_html = imp_df.head(10).to_html(index=False)

    train_fit.unpersist()
    test.unpersist()
    return model_path, metric, importance_html
