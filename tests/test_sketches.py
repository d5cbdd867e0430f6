"""Error-bound tests for the approximate-sketch queries. The registry
queries are oracle-checked via exact values + bound booleans (sketch bits
are engine-specific; the contract is the bound, not the bits); these tests
additionally gate the raw estimate magnitudes the queries don't expose."""

from __future__ import annotations

from data_pipeline_agent_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_hll_within_rsd(spark):
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.plans.registry import table as _table

    row = REGISTRY["approx_distinct_partkeys"].spark(spark, SF_DIR).first()
    # the oracle-checked 3-sigma bound boolean (rsd=0.02 → 6%)
    assert row["hll_within_6pct"], row
    # magnitude gate on the raw estimate the query no longer exposes
    r = _table(spark, str(SF_DIR), "lineitem").agg(
        F.countDistinct("l_partkey").alias("e"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
    ).first()
    assert abs(r["a"] - r["e"]) / r["e"] <= 0.06, r


def test_percentile_approx_close(spark):
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.plans.registry import table as _table

    row = REGISTRY["approx_percentiles_extendedprice"].spark(spark, SF_DIR).first()
    # oracle-checked rank-bound booleans
    assert row["p50_rank_ok"] and row["p99_rank_ok"], row
    # value-closeness gate on the raw approx values the query no longer
    # exposes (1% on this distribution; the formal contract is rank error)
    r = _table(spark, str(SF_DIR), "lineitem").agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.99))").alias("e"),
        F.expr("percentile_approx(l_extendedprice, array(0.5, 0.99), 10000)").alias("a"),
    ).first()
    for i, p in enumerate(("p50", "p99")):
        exact, approx = r["e"][i], r["a"][i]
        assert abs(approx - exact) / exact <= 0.01, (p, exact, approx)


def test_hll_union_by_type(spark):
    rows = REGISTRY["hll_users_by_type_union"].spark(spark, SF_DIR).collect()
    per_type = [r for r in rows if r["event_type"] != "__ALL__"]
    total = [r for r in rows if r["event_type"] == "__ALL__"]
    assert per_type and len(total) == 1
    # every estimate (per-type and union) inside the oracle-checked bound
    for r in rows:
        assert r["hll_within_2pct"], r
    # distinct-union sanity on the exact side: overall users can't exceed
    # the sum of per-type users, nor undercut the largest type
    assert total[0]["n_exact"] <= sum(r["n_exact"] for r in per_type)
    assert total[0]["n_exact"] >= max(r["n_exact"] for r in per_type)


def test_cms_overestimate_bound(spark):
    """CMS guarantees est >= exact, and est <= exact + eps*N with
    confidence 1-delta (eps=0.001, delta=0.01 in the query). The query
    emits bound BOOLEANS (hash-compared against the oracle); this test
    rebuilds the sketch to assert the tighter 1x-eps*N magnitude on the
    raw estimates the query no longer exposes."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.plans import REGISTRY
    from data_pipeline_agent_spark.plans.registry import table as _table

    rows = REGISTRY["cms_heavy_hitters_partkey"].spark(
        spark, str(SF_DIR)
    ).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cms_ge_exact"], f"CMS under-counted: {r}"
        assert r["cms_within_eps"], f"CMS overcount beyond 2x eps*N: {r}"
    li = _table(spark, str(SF_DIR), "lineitem")
    sk_row = li.agg(
        F.expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42)").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    sketch = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row["sk"])
    )
    for r in rows:
        est = int(sketch.estimateCount(r["l_partkey"]))
        assert est >= r["n_exact"]
        assert est <= r["n_exact"] + 0.001 * sk_row["n"], (
            f"CMS overcount beyond eps*N: est={est} {r}"
        )


def test_hll_trailing_window_error_bound(spark):
    """The merged trailing-7d sketch estimate must sit within HLL error
    of the exact trailing distinct (computed directly for the test)."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.plans import REGISTRY
    from data_pipeline_agent_spark.plans.registry import events_table
    from tests.conftest import SF_DIR

    got = {
        r.day: r
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
        row = got[d.strftime("%Y-%m-%d")]
        # the query's own exact column must equal the independent recompute,
        # and every merged estimate must sit inside the oracle-checked bound
        assert row.n_users_7d_exact == n, f"{d}: {row.n_users_7d_exact} vs {n}"
        assert row.hll_within_2pct, f"{d}: sketch-union estimate out of bound"


def test_density_penalized_sampler_drains_dense_regions(spark):
    """r11 (r10 verdict task 5): with equal quality everywhere, docs in
    a dense near-dup clump (identical embeddings -> top-3 neighbor
    cosine sum = 3.0 -> 4x priority penalty) must be under-sampled vs
    the quality-only ordering (same sampler, no vectors -> density 0).
    Everything is deterministic (md5 uniforms, fixed sign buckets), so
    the counts are exact, not statistical."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.plans.queries_corpus import (
        density_penalized_topk,
    )

    text = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [(i, text) for i in range(40)], "doc_id long, text string"
    )
    dense_vec = [1.0] * 8  # bucket 255 for all 20 -> each has 19 mates
    rows = [(i, dense_vec) for i in range(20)]
    for j in range(20, 40):  # unique sign pattern per doc -> no mates
        rows.append((j, [1.0 if (j >> b) & 1 else -1.0 for b in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")

    pen = density_penalized_topk(docs, emb, k=10, bits=8, rotations=1).collect()
    base = density_penalized_topk(docs, empty, k=10, bits=8, rotations=1).collect()
    dens = {r["doc_id"]: r["density"] for r in pen}
    assert all(r["density"] == 0.0 for r in base)
    for d, v in dens.items():
        assert v == (3.0 if d < 20 else 0.0), f"doc {d} density {v}"
    n_dense_pen = sum(1 for r in pen if r["doc_id"] < 20)
    n_dense_base = sum(1 for r in base if r["doc_id"] < 20)
    assert n_dense_pen < n_dense_base, (
        f"penalty did not under-sample the clump: {n_dense_pen} vs "
        f"{n_dense_base} dense docs in the top-10"
    )
    # the penalty is exactly the composition: pri_pen = pri_base/(1+density)
    base_all = {
        r["doc_id"]: r["pri"]
        for r in density_penalized_topk(docs, empty, k=40, bits=8, rotations=1).collect()
    }
    for r in pen:
        expect = base_all[r["doc_id"]] / (1.0 + r["density"])
        assert abs(r["pri"] - expect) < 1e-9 * max(abs(expect), 1.0)
