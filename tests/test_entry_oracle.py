"""Pre-flight of the driver's correctness gate: run every registered query
in Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values — the same contract the driver
records in CORRECTNESS_r{N}.json.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to rehearse the exact driver scale.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from data_pipeline_agent_spark.plans import REGISTRY
from data_pipeline_agent_spark.session import TABLES
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(val):
    """Canonicalize a cell for comparison (floats -> rounded repr)."""
    if val is None:
        return "∅"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6f}"
    if isinstance(val, bool):
        return str(bool(val))
    return str(val)


def _frame_sig(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False))
    return cols, rows


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, SF_DIR).toPandas()
    odf = duck.execute(spec.oracle).df()
    s_cols, s_rows = _frame_sig(sdf)
    o_cols, o_rows = _frame_sig(odf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_all_queries_have_unique_lowercase_aliases(spark):
    for name, spec in REGISTRY.items():
        df = spec.spark(spark, SF_DIR)
        assert len(set(df.columns)) == len(df.columns), f"{name}: duplicate columns"


def test_driver_contract_shape():
    """The adapter the driver consumes: every oracle key names a query,
    every oracle is non-empty SQL text, every query is callable."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in os_.values())
    assert all(callable(f) for f in qs.values())
    # r5: the last rows-only entries were converted to contract oracles —
    # every registered query now carries a DuckDB oracle twin
    assert len(qs) == len(os_), "a registered query lost its oracle"
