"""Sink operators.

Reference parity (SURVEY.md §2.1): the reference persists a model pickle
(S5, /root/reference/main.py:366-371), a single-file feature-importance
CSV (S6, main.py:380-381), and an HTML report string (S7). The model sink
lives in ml/train.py (PipelineModel.save); the CSV and the distributed
sinks the reference never needed live here.

Scale design:
- ``write_partitioned_parquet`` is the default sink at 100 TB: partition
  columns become directory keys, so downstream reads with a partition
  predicate scan only matching directories (partition pruning).
- ``write_bucketed_table`` pre-shuffles ONCE at write time; every later
  join/agg on the bucket key is exchange-free (SortMergeJoin with no
  Exchange on the bucketed side).
- ``write_csv_single`` is the reference's S6 shape — coalesce(1) is only
  for driver-sized results (feature importances, ≤ thousands of rows);
  never use it on fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Joins
    and aggregations on ``bucket_col`` between tables bucketed the same
    way run without a shuffle."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(name)


def write_csv_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6 — single-file CSV with header for driver-sized results
    (reference writes feature importances this way, main.py:380-381)."""
    df.coalesce(1).write.mode(mode).option("header", True).csv(path)


def read_bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` splits the
    data into ``n_files`` contiguous key ranges and ``sortWithinPartitions``
    orders rows inside each file, so every file's parquet row-group
    statistics cover a narrow, (near-)disjoint min/max slice of
    ``cluster_col``.

    This is what makes point/range predicates on the cluster column cheap
    at 100 TB: the parquet reader drops whole row groups whose [min, max]
    misses the filter, so a selective read touches ~1/n_files of the bytes
    instead of scanning everything (single-column Z-ordering, in effect;
    interleave bit-mixed keys upstream for the multi-column variant).
    Range boundaries come from Spark's reservoir sampling of the column —
    a small sampling job at write time, no global sort."""
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(cols, bits: int = 8):
    """Z-order (Morton) key: bit-interleave the ``bits``-bit quantized
    forms of each column expression in ``cols`` (a list of already
    0..2^bits-1 integer Columns). Pure shift/mask arithmetic — one
    codegen'd expression, no UDF."""
    from pyspark.sql import functions as F

    out = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, c in enumerate(cols):
            out = out + (
                F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
                * F.lit(1 << (i * n + j))
            )
    return out


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Multi-column clustered layout: quantize each cluster column to
    ``bits`` bits by min/max linear scaling (bounds from ONE tiny
    aggregate, broadcast), interleave into a Morton key, then range-
    partition + sort on that key.

    Each output file then covers a compact hyper-rectangle of the
    clustered column space instead of a full-width slice, so parquet
    row-group stats prune selective reads on ANY of the cluster columns
    — the multi-dimensional upgrade of ``write_range_clustered``
    (same mechanism Delta/Iceberg OPTIMIZE ZORDER applies). Min/max
    scaling keeps the key a pure scan-stage expression; swap in
    percentile-based quantization upstream for heavily skewed columns."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cluster_cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cluster_cols],
    )
    top = (1 << bits) - 1
    with_bounds = df.crossJoin(F.broadcast(bounds))
    quantized = [
        F.least(
            F.lit(top),
            F.floor(
                (F.col(c) - F.col(f"__lo_{c}"))
                / F.greatest(
                    (F.col(f"__hi_{c}") - F.col(f"__lo_{c}")).cast("double"),
                    F.lit(1e-12),
                )
                * top
            ),
        )
        for c in cluster_cols
    ]
    keyed = with_bounds.withColumn("__zkey", zorder_key(quantized, bits)).drop(
        *[f"__lo_{c}" for c in cluster_cols], *[f"__hi_{c}" for c in cluster_cols]
    )
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 256,
) -> int:
    """Small-files compaction — the table-maintenance pass every long-
    running ingestion pipeline needs (streaming sinks and per-batch
    writes accumulate KB-sized files whose per-file open/footer/task
    overhead eventually dominates scans).

    Sizes the output by the SOURCE's actual on-disk bytes (driver-side
    file listing, no data read), then rewrites with a round-robin
    ``repartition`` — an even, parallel redistribution, unlike
    ``coalesce`` which only merges co-located partitions and can leave
    the tail skewed. Writes to a NEW path: swap-in is the caller's
    atomic-rename/metastore step. Returns the output file count."""
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def align_schemas(dfs: list[DataFrame]) -> DataFrame:
    """Schema-evolution union: rows from every frame, with columns missing
    in any frame filled with NULL — ``unionByName(allowMissingColumns)``
    folded over the list. The read-side half of schema evolution (the
    write side is parquet's mergeSchema); use when batches of the same
    logical table gained/lost columns over time."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "shuffle42:",
    compression: str = "gzip",
    text_col: str = "text",
) -> DataFrame:
    """Export a curated corpus as deterministically-shuffled JSONL training
    shards + a manifest.

    The layout counterpart of the corpus_shuffle_shards query: shard
    assignment is a salted md5 hash of the stable id (identical across
    reruns/engines/partitionings — no RNG), rows are ordered by the md5
    key within each shard (uniform pseudo-random training order), and the
    write is ONE repartition + sortWithinPartitions + partitioned write.
    Returns the manifest DataFrame (shard -> n_rows, n_chars), computed
    from the same frame in the same pass structure; at 100 TB a trainer
    consumes the manifest to plan epoch schedules without listing files.
    """
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.functions.text_hash import h32

    salted = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    keyed = df.withColumn("__key", F.md5(salted)).withColumn(
        "shard", F.pmod(h32(salted), F.lit(n_shards)).cast("long")
    )
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__key")
        .drop("__key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", compression)
        .json(out_dir)
    )
    # n_chars only when the frame HAS a text column (the sink is generic
    # over id_col; a feature frame without text must not fail at manifest
    # time, after the shard write already ran)
    size_aggs = (
        [F.sum(F.length(F.col(text_col).cast("string"))).cast("long").alias("n_chars")]
        if text_col in df.columns
        else []
    )
    manifest = keyed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"), *size_aggs
    )
    return manifest
