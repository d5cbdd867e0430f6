"""Multimodal contract queries — the correctness surface for
``operators/multimodal.py`` (r6 verdict task 2: the only first-class
family that had no CORRECTNESS entry).

The reference has no media pipeline; these are brief-mandated extensions
("multimodal columns: image/audio/video as opaque binary columns").  The
container has no PIL/soundfile/pyav, so the registered queries run the
documented deterministic fake featureizer (``fake=True`` — md5-derived,
stable across runs/partitions); the REAL part under test is the Spark-side
plumbing the brief asks for: binary-column schema, Arrow-batched
``mapInPandas``, per-row frame/window fan-out, narrow feature output.

Oracle pattern (the r4 sketch/ML contract style): every SQL-derivable
output value is emitted for the driver's exact hash compare — ``n_bytes``
(UTF-8 byte length of the synthetic blob), ``n_windows`` (window count at
the fixed stride), ``frame_idx`` (the sampled-frame fan-out, reproduced in
DuckDB via ``unnest(range(0, n_frames, every_n))``) — plus in-row booleans
computed GENUINELY from the feature arrays JVM-side (dimension == 16,
every component finite and in [0,1]); the oracle emits literal TRUEs, so a
wrong dimension, NaN, out-of-range component, wrong fan-out, or dropped
row turns the driver hash red.

Scale notes: blobs are synthesized executor-side from the documents scan
(encode(text) — never collected), features stream through Arrow batches,
and output rows are narrow (id + scalars + booleans).  At 100 TB the same
plan holds with real media bytes: ``maxPartitionBytes`` bounds per-task
blob volume and the mapInPandas stage is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_agent_spark.operators.multimodal import (
    audio_features,
    frame_sample,
    image_features,
)
from data_pipeline_agent_spark.plans.registry import register, table

FEATURE_DIM = 16


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table: one blob per document, the
    UTF-8 bytes of its text standing in for decoded media content.  Shape
    matches ``operators.multimodal.MEDIA_SCHEMA``; byte lengths (48-600 at
    test SFs) give a real spread of window/frame counts."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("png").alias("meta_format"),
        F.lit(64).cast("long").alias("meta_width"),
        F.lit(64).cast("long").alias("meta_height"),
    )


def _feature_contract_cols():
    """Booleans computed from the feature array itself, JVM-side."""
    return [
        (F.size("feature") == FEATURE_DIM).alias("dim_ok"),
        F.forall(
            "feature",
            lambda v: v.isNotNull() & ~F.isnan(v) & (v >= 0.0) & (v <= 1.0),
        ).alias("in_range_ok"),
    ]


def _oracle_feature_byte(i: int) -> str:
    """DuckDB twin of ``_fake_feature_src``'s component ``i`` (i < 16, the
    salt-0 digest): byte ``i`` of md5(b'\\x00' + utf8(text)) / 255, rounded
    to 6 decimals.  ``chr(0) || text`` hashes byte-identically to the
    Python ``b'\\x00' + content`` prefix (verified: digests match), so the
    oracle reproduces the actual float the executor-side featureizer
    emits — not just a range boolean."""
    return (
        f"round(CAST('0x' || substr(md5(chr(0) || text), {2 * i + 1}, 2) "
        f"AS INT) / 255.0, 6)"
    )


@register(
    "mm_image_features",
    oracle=f"""
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               {_oracle_feature_byte(0)} AS f0,
               {_oracle_feature_byte(7)} AS f7,
               {_oracle_feature_byte(15)} AS f15,
               TRUE AS dim_ok,
               TRUE AS in_range_ok
        FROM documents
    """,
    description="Multimodal image featurization contract: Arrow-batched "
    "mapInPandas over binary blobs; n_bytes exact-matched against the "
    "oracle's octet_length, three feature components (first/middle/last "
    "digest byte) exact-matched against DuckDB's md5 of the same salted "
    "bytes, and feature dim/finiteness/range booleans computed JVM-side "
    "from the returned arrays",
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = image_features(_media_frame(spark, sf_dir), fake=True)

    def probe(i: int):
        # stored as float32; re-round after the double cast to recover the
        # exact 6-dp decimal the featureizer (and the oracle) computed
        return F.round(
            F.element_at("feature", i + 1).cast("double"), 6
        ).alias(f"f{i}")

    return feats.select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        probe(0),
        probe(7),
        probe(15),
        *_feature_contract_cols(),
    )


@register(
    "mm_audio_features",
    oracle="""
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ceil(greatest(octet_length(encode(text)), 1) / 128.0)
                    AS BIGINT) AS n_windows,
               TRUE AS dim_ok,
               TRUE AS in_range_ok
        FROM documents
    """,
    description="Multimodal audio featurization contract: fixed-stride "
    "(128-byte) windowing + mean-pooled per-window features; n_bytes AND "
    "the window count are exact-matched (ceil(len/128) in the oracle), "
    "pooled-feature dim/range booleans computed JVM-side",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = audio_features(_media_frame(spark, sf_dir), window_bytes=128, fake=True)
    return feats.select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("n_windows").cast("long").alias("n_windows"),
        *_feature_contract_cols(),
    )


@register(
    "mm_frame_sample",
    # per-frame digest input is content + frame_idx.to_bytes(4, 'big');
    # chr() of each suffix byte reproduces it as long as frame_idx < 128
    # (single-byte UTF-8) — testdata frames top out near 10 per doc, and
    # the bound is ASSERTED inside the query's f0 expression (r8): a
    # bigger-documents corpus fails loud with the fix named instead of
    # going red on an oracle artifact
    oracle="""
        SELECT media_id,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               round(CAST('0x' || substr(md5(chr(0) || text || chr(0) ||
                     chr(0) || chr(0) || chr(CAST(frame_idx AS INT))), 1, 2)
                     AS INT) / 255.0, 6) AS f0,
               TRUE AS dim_ok,
               TRUE AS in_range_ok
        FROM (
            SELECT doc_id AS media_id,
                   text,
                   unnest(range(0,
                       greatest(1, octet_length(encode(text)) // 64),
                       2)) AS frame_idx
            FROM documents
        )
    """,
    description="Multimodal video frame sampling contract: one row per "
    "sampled frame (64-byte 'frames', every 2nd sampled); the exact "
    "per-media frame_idx fan-out is reproduced by the oracle via "
    "unnest(range(0, n_frames, 2)) and each frame's first feature "
    "component is exact-matched against DuckDB's md5 of the same "
    "content+frame-index bytes — a missing/extra/misindexed frame or a "
    "wrong per-frame digest turns the hash red; dim/range booleans "
    "computed JVM-side",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(_media_frame(spark, sf_dir), every_n=2, fake=True)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        _guarded_f0(),
        *_feature_contract_cols(),
    )


def _guarded_f0():
    """f0 with the oracle's byte contract asserted IN the expression (r8,
    verdict task 6): the DuckDB twin rebuilds the 4-byte big-endian frame
    index with chr(), which is only byte-identical to the Python
    ``to_bytes`` suffix for frame_idx < 128 (single-byte UTF-8). Today's
    testdata tops out near frame 10, but a bigger-documents tile would
    cross 128 and the hash would go red on an ORACLE artifact, not an
    engine bug — so the bound fails LOUD with a message naming the fix.
    The assert lives inside the consumed f0 column (assert_true returns
    NULL on pass, so ``+ coalesce(guard, 0)`` is value-neutral), making it
    arithmetically required — column pruning can never drop it, and
    Catalyst cannot collapse it the way an identical-branch CASE WHEN
    would be (SimplifyConditionals folded the first form of this guard
    clean out of the plan)."""
    guard = F.assert_true(
        F.col("frame_idx") < 128,
        F.lit(
            "mm_frame_sample oracle contract violated: frame_idx >= 128 "
            "cannot be rebuilt with single-byte chr() in the DuckDB twin "
            "(blob >= ~8.2 KB at 64-byte frames) — extend the oracle to "
            "multi-byte index encoding before raising the bound; the "
            "engine-side frame_sample output itself is correct"
        ),
    )
    f0 = F.round(F.element_at("feature", 1).cast("double"), 6)
    return (f0 + F.coalesce(guard.cast("double"), F.lit(0.0))).alias("f0")
