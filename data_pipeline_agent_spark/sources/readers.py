"""Scan operators — format dispatch by extension (S1-S3,
/root/reference/main.py:397-413; default CSV).

CSV/JSON/Parquet go straight to distributed Spark readers with schema
inference matching the reference's pandas inference (S1). Excel has no
core-Spark reader; the reference caps uploads at 50 MB (main.py:538) so a
driver-side pandas read -> Arrow createDataFrame is faithful AND safe (S2).
At cluster scale the real inputs are partitioned parquet/CSV directories,
which these readers accept unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .option("inferSchema", True)
        # pandas parses ISO timestamps during inference; Spark needs the flag
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side pandas read (requires openpyxl/xlrd) -> Arrow DataFrame."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path)
    except ImportError as e:  # openpyxl not installed in this container
        raise NotImplementedError(f"Excel reading requires openpyxl/xlrd: {e}") from e
    return spark.createDataFrame(pdf)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


_DISPATCH = {
    ".csv": read_csv,
    ".xlsx": read_excel,
    ".xls": read_excel,
    ".parquet": read_parquet,
    ".json": read_json,
}


def read_any(spark: SparkSession, path: str) -> DataFrame:
    """S3 — extension dispatch, default CSV (main.py:397-413)."""
    ext = os.path.splitext(path)[1].lower()
    return _DISPATCH.get(ext, read_csv)(spark, path)
