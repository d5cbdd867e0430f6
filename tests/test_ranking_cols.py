"""Round-5 regression guards for the percentile front-ends and the fuzzy
variant-explosion parallelism fix.

- exact_percentiles_cols must be value-identical to exact_percentiles on
  the equivalent melted frame (same GK banding + probe machinery, only
  pass 1 differs), including NULL columns and empty input.
- grouped_exact_percentiles chunking (keys_per_pass) must not change
  results — it only bounds the compiled expression tree per pass.
- fuzzy_pairs_by_deletion must re-spread the deduped name grain before
  the variant explode: AQE coalesces the tiny aggregate to one
  partition, and without the widen the whole ~172-variants-per-name
  substr-splice runs on a single core (the round-5 10.8 s -> 3.8 s fix).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_exact_percentiles_cols_matches_melted(spark):
    from data_pipeline_agent_spark.operators.ranking import (
        exact_percentiles,
        exact_percentiles_cols,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cols_out = exact_percentiles_cols(
        li,
        {
            "l_quantity": [(0.25, "a"), (0.5, "b"), (0.75, "c")],
            "l_discount": [(0.5, "d")],
        },
    ).first()
    melted = li.selectExpr(
        "stack(2, 'q', CAST(l_quantity AS DOUBLE),"
        " 'd', CAST(l_discount AS DOUBLE)) AS (k, v)"
    ).where(F.col("v").isNotNull())
    mel_out = exact_percentiles(
        melted,
        "k",
        "v",
        [("q", 0.25, "a"), ("q", 0.5, "b"), ("q", 0.75, "c"), ("d", 0.5, "d")],
    ).first()
    for c in ("a", "b", "c", "d"):
        assert cols_out[c] == mel_out[c], (c, cols_out[c], mel_out[c])


def test_exact_percentiles_cols_null_column(spark):
    from data_pipeline_agent_spark.operators.ranking import exact_percentiles_cols

    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None)], "x double, y double"
    )
    row = exact_percentiles_cols(df, {"x": [(0.5, "mx")], "y": [(0.5, "my")]}).first()
    assert row["mx"] == 2.0
    assert row["my"] is None


def test_grouped_exact_percentiles_chunking_invariant(spark):
    from data_pipeline_agent_spark.operators.ranking import grouped_exact_percentiles

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderpriority", "o_totalprice"
    )
    one_pass = grouped_exact_percentiles(
        orders, "o_orderpriority", "o_totalprice", [0.5, 0.9], ["p50", "p90"]
    ).collect()
    chunked = grouped_exact_percentiles(
        orders,
        "o_orderpriority",
        "o_totalprice",
        [0.5, 0.9],
        ["p50", "p90"],
        keys_per_pass=2,
    ).collect()
    assert sorted(map(tuple, one_pass)) == sorted(map(tuple, chunked))


def test_grouped_exact_percentiles_null_key_and_extras(spark):
    """r13 fusion (VERDICT r12 task 2): the NULL group key rides the same
    fused pass-1 aggregate and probe passes as real keys (IS NULL
    predicates), and caller aggregates piggyback on pass 1 via
    extra_aggs — values must match hand-computed linear-interpolation
    quantiles and exact count/sum, per key, including the NULL key, and
    must be chunking-invariant (the chunked base predicate must keep the
    NULL slice)."""
    import pytest

    from data_pipeline_agent_spark.operators.ranking import (
        grouped_exact_percentiles,
    )

    data = (
        [("a", float(i)) for i in range(1, 101)]
        + [(None, float(3 * i)) for i in range(1, 51)]
        + [("b", 7.0)]
    )
    df = spark.createDataFrame(data, "k string, v double")
    kwargs = dict(
        include_null_key=True,
        extra_aggs=[
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").alias("s"),
        ],
        extra_schema="n bigint, s double",
    )
    rows = {
        r["k"]: r
        for r in grouped_exact_percentiles(
            df, "k", "v", [0.5, 0.9], ["p50", "p90"], **kwargs
        ).collect()
    }
    assert set(rows) == {"a", "b", None}
    # a: 1..100 -> rank p*(n-1); p50 = 50.5, p90 = 90.1
    assert rows["a"]["p50"] == pytest.approx(50.5, abs=1e-9)
    assert rows["a"]["p90"] == pytest.approx(90.1, abs=1e-9)
    assert rows["a"]["n"] == 100 and rows["a"]["s"] == pytest.approx(5050.0)
    # NULL key: 3,6,...,150 -> p50 = 76.5, p90 = 135.3
    assert rows[None]["p50"] == pytest.approx(76.5, abs=1e-9)
    assert rows[None]["p90"] == pytest.approx(135.3, abs=1e-9)
    assert rows[None]["n"] == 50 and rows[None]["s"] == pytest.approx(3825.0)
    # b: singleton
    assert rows["b"]["p50"] == 7.0 and rows["b"]["p90"] == 7.0
    assert rows["b"]["n"] == 1 and rows["b"]["s"] == 7.0
    chunked = {
        r["k"]: r
        for r in grouped_exact_percentiles(
            df, "k", "v", [0.5, 0.9], ["p50", "p90"], keys_per_pass=1, **kwargs
        ).collect()
    }
    for k, r in rows.items():
        assert tuple(r) == tuple(chunked[k]), (k, r, chunked[k])


def test_fuzzy_variant_explode_is_respread(spark):
    """The exploded variant frame's plan must carry a round-robin exchange
    between the dedupe aggregate and the generate — without it AQE's
    1-partition coalesce serializes candidate generation on one core."""
    from data_pipeline_agent_spark.operators.joins import fuzzy_pairs_by_deletion

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    names = cust.groupBy(
        F.col("c_nationkey").alias("nk"), F.col("c_name").alias("nm")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    pairs = fuzzy_pairs_by_deletion(names, ["nk"], "nm", max_distance=2)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "RoundRobinPartitioning" in plan or "Repartition" in plan, plan[:1500]
