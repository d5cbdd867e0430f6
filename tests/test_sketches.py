"""Error-bound tests for the approximate-sketch queries (no DuckDB oracle:
sketches are engine-specific; the contract is the bound, not the bits)."""

from __future__ import annotations

from data_pipeline_agent_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_hll_within_rsd(spark):
    row = REGISTRY["approx_distinct_partkeys"].spark(spark, SF_DIR).first()
    # rsd=0.02 → 3-sigma bound 6%; generous but a real regression gate
    assert row["rel_err"] <= 0.06, row


def test_percentile_approx_close(spark):
    row = REGISTRY["approx_percentiles_extendedprice"].spark(spark, SF_DIR).first()
    for p in ("p50", "p99"):
        exact, approx = row[f"{p}_exact"], row[f"{p}_approx"]
        assert abs(approx - exact) / exact <= 0.01, (p, exact, approx)


def test_hll_union_by_type(spark):
    rows = REGISTRY["hll_users_by_type_union"].spark(spark, SF_DIR).collect()
    per_type = [r for r in rows if r["event_type"] != "__ALL__"]
    total = [r for r in rows if r["event_type"] == "__ALL__"]
    assert per_type and len(total) == 1
    # per-type estimates within HLL default-precision 3-sigma (~5%)
    for r in per_type:
        assert abs(r["n_approx"] - r["n_exact"]) <= max(3, 0.05 * r["n_exact"]), r
    # the union estimate must be <= sum of parts and >= the largest part
    assert total[0]["n_approx"] <= sum(r["n_approx"] for r in per_type)
    assert total[0]["n_approx"] >= max(r["n_approx"] for r in per_type) * 0.95


def test_cms_overestimate_bound(spark):
    """CMS guarantees est >= exact, and est <= exact + eps*N with
    confidence 1-delta (eps=0.001, delta=0.01 in the query)."""
    from data_pipeline_agent_spark.plans import REGISTRY

    rows = REGISTRY["cms_heavy_hitters_partkey"].spark(
        spark, str(SF_DIR)
    ).collect()
    assert len(rows) == 10
    n_total = 60_000 * 1  # sf0.001 lineitem ~60k? bound uses actual N below
    # recompute N from the table for a correct bound at any SF_DIR
    from data_pipeline_agent_spark.plans.registry import table as _table

    n_total = _table(spark, str(SF_DIR), "lineitem").count()
    for r in rows:
        assert r["n_cms"] >= r["n_exact"], "CMS must never under-count"
        assert r["overcount"] == r["n_cms"] - r["n_exact"]
        assert r["n_cms"] <= r["n_exact"] + 0.001 * n_total * 10, (
            f"CMS overcount beyond 10x eps*N bound: {r}"
        )


def test_hll_trailing_window_error_bound(spark):
    """The merged trailing-7d sketch estimate must sit within HLL error
    of the exact trailing distinct (computed directly for the test)."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.plans import REGISTRY
    from data_pipeline_agent_spark.plans.registry import events_table
    from tests.conftest import SF_DIR

    got = {
        r.day: r.n_users_7d_approx
        for r in REGISTRY["hll_trailing_7d_users"].spark(spark, SF_DIR).collect()
    }
    ev = events_table(spark, SF_DIR).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    a = ev.select(F.col("day").alias("d")).distinct()
    exact = {
        r.d: r.n
        for r in a.join(
            ev, (ev.day >= F.date_sub(F.col("d"), 6)) & (ev.day <= F.col("d"))
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == {d.strftime("%Y-%m-%d") for d in exact}
    for d, n in exact.items():
        est = got[d.strftime("%Y-%m-%d")]
        assert abs(est - n) <= max(3, 0.1 * n), f"{d}: est {est} vs exact {n}"
