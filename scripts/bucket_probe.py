"""Third-decade check of the adaptive-bits quantization claim (r9,
VERDICT r8 task 6).

SCALE.md argues the kNN graph's per-decade candidate-pair ratio is the
bounded, non-compounding ceil() quantization of the adaptive bit width
(<= ~12.5x per 10x data). The r8 evidence covered one decade (sf1 tile ->
sf10 tile, 12.50x measured from the bucket histogram). This probe adds
the NEXT decade without materializing any graph: the candidate-pair
count IS sum over (rotation, bucket) of bucket_size^2, so a
groupBy(rot, bkt).count() scan per tier is the whole measurement —
seconds, not the 25-minute graph build.

The 2M-vector "sf100-equivalent" tier is synthesized IN MEMORY (never
written): the sf10 tile's 200k embeddings x 10 sign-flip replicas.
Flipping the sign of dimension j flips exactly hyperplane bit j, so a
sign-flip replica's bucket is base_bucket XOR mask — a PERMUTATION of
the bucket space per replica. Ten distinct masks give ten
independently-permuted copies of the base occupancy histogram, which for
the centered testdata distribution has the same expected sum-of-squares
as ten fresh draws (the cross terms are uniform-random bucket
collisions), while each replica keeps the base per-dimension value
distribution exactly — the same fidelity argument as the tiler's
dihedral family, documented as a proxy. Mask 0 is the identity.

Usage: python scripts/bucket_probe.py   # writes bucket_probe.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_agent_spark.operators.similarity import (  # noqa: E402
    adaptive_bits,
    adaptive_rotations,
    sign_bucket,
)
from data_pipeline_agent_spark.session import get_spark  # noqa: E402

SF1_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale/sf1")
SF10_DIR = os.environ.get("SPARK_GRAFT_SCALE100_DIR", "/tmp/spark_graft_scale/sf10")
SYNTH_REPS = 10  # sf10 tile x 10 sign-flip replicas = the 2M third-decade tier
EMB_DIM = 64


def _flip_masks(reps: int, dim: int) -> list[list[float]]:
    """Deterministic +-1 masks; mask 0 is the identity. Distinctness is
    asserted (two equal masks would collapse two replicas of a base
    vector into the same bucket in EVERY rotation, inflating
    sum-of-squares the way the tiler's injectivity rules forbid)."""
    masks = [[1.0] * dim]
    for r in range(1, reps):
        h = (r * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
        masks.append([1.0 if (h >> j) & 1 else -1.0 for j in range(dim)])
    assert len({tuple(m) for m in masks}) == reps
    return masks


def histogram_stats(emb: DataFrame, n: int, vec_col: str = "embedding") -> dict:
    """Adaptive operating point for corpus size n, plus the measured
    bucket histogram: candidate pairs (sum cnt^2 over (rot, bkt)), bucket
    count, max bucket, and the uniform expectation n/2^bits."""
    bits = adaptive_bits(n)
    rots = adaptive_rotations(bits, EMB_DIM)
    b = emb.select(
        F.posexplode(
            F.array(
                *[sign_bucket(F.col(vec_col), bits, r * bits) for r in range(rots)]
            )
        ).alias("__rot", "__bkt")
    )
    agg = (
        b.groupBy("__rot", "__bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * F.col("c")).alias("pairs"),
            F.max("c").alias("max_bucket"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .first()
    )
    return {
        "n": n,
        "bits": bits,
        "rotations": rots,
        "cand_pairs": int(agg["pairs"]),
        "max_bucket": int(agg["max_bucket"]),
        "n_buckets": int(agg["n_buckets"]),
        "uniform_expected_bucket": round(n / 2**bits, 1),
    }


def main() -> None:
    spark = get_spark("bucket_probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for tag, d in (("sf1_tile", SF1_DIR), ("sf10_tile", SF10_DIR)):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        out[tag] = histogram_stats(emb, n)

    # third decade: sf10 x 10 sign-flip replicas, in memory only
    base = spark.read.parquet(f"{SF10_DIR}/embeddings.parquet").select("embedding")
    masks = _flip_masks(SYNTH_REPS, EMB_DIM)
    rep = F.explode(F.sequence(F.lit(0), F.lit(SYNTH_REPS - 1))).alias("__rep")
    with_rep = base.select("embedding", rep)
    flipped = F.col("embedding")
    for r in range(1, SYNTH_REPS):
        expr = F.zip_with(
            F.col("embedding"), F.lit(masks[r]), lambda x, m: x.cast("double") * m
        )
        flipped = F.when(F.col("__rep") == r, expr).otherwise(flipped)
    synth = with_rep.select(flipped.alias("embedding"))
    n100 = out["sf10_tile"]["n"] * SYNTH_REPS
    out["sf100_synth"] = histogram_stats(synth, n100)
    out["sf100_synth"]["proxy"] = (
        f"sf10 tile x {SYNTH_REPS} sign-flip replicas (in-memory; bucket-"
        "permutation argument in the module docstring)"
    )

    out["decade2_ratio"] = round(
        out["sf10_tile"]["cand_pairs"] / out["sf1_tile"]["cand_pairs"], 2
    )
    out["decade3_ratio"] = round(
        out["sf100_synth"]["cand_pairs"] / out["sf10_tile"]["cand_pairs"], 2
    )
    repo = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(repo, "bucket_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
