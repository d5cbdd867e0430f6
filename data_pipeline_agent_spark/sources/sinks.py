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
