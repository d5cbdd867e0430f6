"""Named-query registry.

Every operator the engine claims (SURVEY.md §2 + extensions) registers one
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when
SQL-expressible, a DuckDB oracle SQL twin the driver hash-compares against.

Conventions that make the driver's order-insensitive value-hash match:
- every computed column is aliased identically (lowercase) on both sides;
- float outputs of AGGREGATES are rounded to 6 decimals on both sides
  (Spark and DuckDB sum in different orders; per-row arithmetic is left
  exact since IEEE doubles agree bit-for-bit on identical expressions);
- never AVERAGE already-rounded values into a hash-compared column: the
  mean of n 6-dp values lands exactly on a 7th-digit midpoint whenever n
  divides the last digit's sum (half the time for n=2), and Spark/DuckDB
  resolve the double-midpoint tie differently (observed: 0.1082715 ->
  0.108271 vs 0.108272). SUM the rounded values instead — a sum of 6-dp
  decimals has an exact 6-dp total, so an order-of-addition ulp cannot
  cross a rounding boundary — and derive the mean downstream if needed;
- integer outputs are cast to BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    description: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None -> rows-only check
    # True for the few queries whose builder resolves driver-side scalars
    # (exact percentiles via distributed selection) at CONSTRUCTION time:
    # calling .spark() runs jobs before the returned frame is acted on.
    # Plan-only tooling (dump_plans, plan-shape sweeps) still works — the
    # returned frame is lazy — but building it is not free; registry
    # enumeration at bench scale should expect these to scan.
    materializes_on_build: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    materializes_on_build: bool = False,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name,
            description=description,
            spark=fn,
            oracle=oracle,
            materializes_on_build=materializes_on_build,
        )
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return events_table(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_NUM_ROWS_CACHE: dict[str, int] = {}


def table_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata — no Spark job, no
    data scan (r9, judge task 4). The adaptive-mode operators (kNN-graph
    bucket width, SemDeDup cell count) size themselves from the corpus;
    paying a full count() action per invocation is an extra corpus scan
    at 100 TB purely to pick a constant. Footer row counts are exact for
    parquet (every writer stamps num_rows), and memoized per path — on a
    real cluster this is the catalog-statistics lookup."""
    path = f"{sf_dir}/{name}.parquet"
    if path not in _NUM_ROWS_CACHE:
        import pyarrow.dataset as ds

        _NUM_ROWS_CACHE[path] = int(
            ds.dataset(path, format="parquet").count_rows()
        )
    return _NUM_ROWS_CACHE[path]


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.parquet's ``ts`` to session-local TIMESTAMP
    regardless of how the generator wrote it:

    - INT64 TIMESTAMP(NANOS) (older testdata): Spark 4 refuses it by
      default — read nanos as long (legacy conf) and truncate to micros,
      matching DuckDB's CAST(ts AS TIMESTAMP) truncation of TIMESTAMP_NS;
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) (pandas default): Spark
      reads TIMESTAMP_NTZ, which refuses numeric casts the event-time
      plans use — cast to TIMESTAMP; with the session timezone pinned to
      UTC (session.py) the wall-clock values are unchanged and agree with
      DuckDB's naive read.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict((f.name, f.dataType) for f in df.schema.fields)["ts"]
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
