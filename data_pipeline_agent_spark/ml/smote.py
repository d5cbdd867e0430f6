"""Distributed SMOTE (M8, /root/reference/main.py:253-262).

The reference calls imblearn's SMOTE: for each minority sample pick one of
its k nearest same-class neighbors and emit ``x + u * (nn - x)``, u ~
U(0,1). There is no MLlib equivalent; naive kNN is an all-pairs join. This
implementation keeps the exact synthetic-sample recipe but finds
neighbors with BucketedRandomProjectionLSH (approx kNN, the standard
distributed relaxation):

1. per minority class: assemble features, fit a seeded random-projection
   LSH, self-join within a distance threshold estimated from a feature-
   scale sample (one tiny collect of per-column stddevs);
2. keep each row's k nearest candidates (one window over the candidate
   pairs — cost O(candidates), never O(n^2));
3. sample the (row, neighbor) pool down/up to the needed count and
   interpolate with a DETERMINISTIC u = hash(id_a, id_b, seed) / 2^20 —
   re-runs produce identical synthetics, which imblearn does not give you
   but a production pipeline wants.

Falls back (silently, matching the reference's try/except shape at
main.py:258-260) to random oversampling in the caller when a class is too
small to have neighbors (< 2 rows).
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, VectorAssembler
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 42


def _deterministic_u(a, b, seed: int):
    """U(0,1) pseudo-random, stable across runs: 20 low bits of a seeded hash."""
    return (F.abs(F.hash(a, b, F.lit(seed))) % F.lit(1 << 20)) / F.lit(float(1 << 20))


def smote_oversample(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    k: int = 5,
    seed: int = SEED,
) -> DataFrame:
    """Return (feature_cols..., label_col) with synthetic minority rows
    appended so every class roughly matches the majority count."""
    base = df.select(*feature_cols, label_col)
    counts = {r[0]: r[1] for r in base.groupBy(label_col).count().collect()}
    if not counts:
        return base
    maxc = max(counts.values())

    # feature scale -> LSH bucket length / join radius (one tiny collect)
    stats = base.agg(
        *[F.coalesce(F.stddev(c), F.lit(1.0)).alias(c) for c in feature_cols]
    ).first()
    import math

    scale = math.sqrt(sum(float(stats[c]) ** 2 for c in feature_cols)) or 1.0

    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="__vec", handleInvalid="keep"
    )
    out = base
    for cls, cnt in counts.items():
        extra = maxc - cnt
        if extra <= 0 or cnt < 2:
            continue
        # Content-derived id (NOT monotonically_increasing_id): stable
        # across cache eviction / task retries / partition recomputation,
        # so the LSH fit, the pair join, and the deterministic-u
        # interpolation all agree on ids even if partitions are rebuilt.
        # Duplicate feature rows share an id; the ida != idb filter then
        # drops self-pairs of identical points, which interpolate to the
        # point itself anyway (zero information loss).
        mino = (
            base.where(F.col(label_col) == cls)
            .withColumn("__id", F.xxhash64(*[F.col(c) for c in feature_cols]))
        )
        mv = assembler.transform(mino).persist()
        lsh = BucketedRandomProjectionLSH(
            inputCol="__vec",
            outputCol="__hashes",
            bucketLength=scale,
            numHashTables=3,
            seed=seed,
        ).fit(mv)
        pairs = (
            lsh.approxSimilarityJoin(mv, mv, 2.0 * scale, distCol="__dist")
            .where(F.col("datasetA.__id") != F.col("datasetB.__id"))
            .select(
                F.col("datasetA.__id").alias("__ida"),
                F.col("datasetB.__id").alias("__idb"),
                F.array(*[F.col(f"datasetA.{c}") for c in feature_cols]).alias("__xa"),
                F.array(*[F.col(f"datasetB.{c}") for c in feature_cols]).alias("__xb"),
                "__dist",
            )
        )
        wk = Window.partitionBy("__ida").orderBy(F.asc("__dist"), F.asc("__idb"))
        pool = pairs.withColumn("__rk", F.row_number().over(wk)).where(F.col("__rk") <= k)
        # pool size ~ cnt*k; sample it to ~extra synthetics (with
        # replacement when more are needed than the pool holds)
        frac = extra / (cnt * k)
        sampled = pool.sample(withReplacement=frac > 1.0, fraction=frac, seed=seed)
        # Eagerly checkpoint the (small, ~extra-row) sampled pool so its
        # lineage no longer references mv, then release the per-class
        # cache — otherwise every class iteration leaks a persisted frame
        # until the session ends.
        sampled = sampled.localCheckpoint(eager=True)
        mv.unpersist()
        u = _deterministic_u(F.col("__ida"), F.col("__idb"), seed)
        interp = F.zip_with(
            "__xa", "__xb", lambda a, b: a + u * (b - a)
        ).alias("__syn")
        synth = sampled.select(interp).select(
            *[F.col("__syn").getItem(i).alias(c) for i, c in enumerate(feature_cols)],
            F.lit(cls).cast(dict((f.name, f.dataType) for f in base.schema.fields)[label_col]).alias(label_col),
        )
        out = out.unionByName(synth)
    return out
