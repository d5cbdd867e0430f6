"""Unit tests for the join-operator extensions (operators/joins.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_agent_spark.operators.joins import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05")),  # after both right rows for key 10
            (2, 10, _ts("2024-01-02")),  # exactly ON a right ts (inclusive)
            (3, 10, _ts("2024-01-01")),  # before the first right row -> null
            (4, 99, _ts("2024-01-05")),  # key with no right rows -> null
        ],
        "eid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-02"), 100.0),
            (10, _ts("2024-01-04"), 200.0),
        ],
        "k long, rts timestamp, v double",
    )
    out = {
        r["eid"]: r["v"]
        for r in asof_join(
            left, right, "k", "k", "ts", "rts", ["v"], tiebreak="v"
        ).collect()
    }
    assert out[1] == 200.0  # latest at-or-before 01-05
    assert out[2] == 100.0  # equality is inclusive
    assert out[3] is None  # nothing at-or-before
    assert out[4] is None  # key never seen on the right


def test_asof_join_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, 5, _ts("2024-02-01"))], "eid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01"), 1.0), (5, _ts("2024-01-01"), 9.0)],
        "k long, rts timestamp, v double",
    )
    rows = asof_join(left, right, "k", "k", "ts", "rts", ["v"], tiebreak="v").collect()
    assert rows[0]["v"] == 9.0  # greatest tiebreak wins among same-ts rows


def test_asof_join_null_tiebreak_loses(spark):
    # A NULL tiebreak must lose to ANY non-null value among same-ts right
    # rows (the row_number-over-desc dedup semantics: desc = nulls last,
    # rn=1 picks a non-null first) — NULLS FIRST in the fused sort.
    left = spark.createDataFrame([(1, 5, _ts("2024-02-01"))], "eid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01"), None, "null-tb"), (5, _ts("2024-01-01"), 1.0, "real-tb")],
        "k long, rts timestamp, tb double, label string",
    )
    rows = asof_join(
        left, right, "k", "k", "ts", "rts", ["label"], tiebreak="tb"
    ).collect()
    assert rows[0]["label"] == "real-tb"


def test_range_join_broadcast_plan(spark):
    fact = spark.range(100).select((F.col("id") * 10.0).alias("x"))
    bands = spark.createDataFrame(
        [("low", 0.0, 500.0), ("high", 500.0, 2000.0)], "band string, lo double, hi double"
    )
    out = range_join(fact, bands, F.col("x"))
    counts = {r["band"]: r["n"] for r in out.groupBy("band").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"low": 50, "high": 50}
    # the band side must be broadcast: no shuffle of the fact table
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


from hypothesis import given, settings, strategies as st


@st.composite
def _asof_case(draw):
    keys = [1, 2, 3]
    n_l = draw(st.integers(1, 12))
    n_r = draw(st.integers(0, 12))
    left = [
        (i, draw(st.sampled_from(keys)), draw(st.integers(0, 50)))
        for i in range(n_l)
    ]
    right = [
        (draw(st.sampled_from(keys)), draw(st.integers(0, 50)), float(j))
        for j in range(n_r)
    ]
    return left, right


@given(_asof_case())
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_naive(spark, case):
    """asof_join == the obvious quadratic definition on random inputs:
    value of the right row with max(rts) <= ts for the key, ties broken
    by greatest tiebreak value."""
    left, right = case
    ldf = spark.createDataFrame(
        [(eid, k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)) for eid, k, m in left],
        "eid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), v) for k, m, v in right],
        "k long, rts timestamp, v double",
    )
    got = {
        r["eid"]: r["v"]
        for r in asof_join(ldf, rdf, "k", "k", "ts", "rts", ["v"], tiebreak="v").collect()
    }
    for eid, k, m in left:
        cands = [(rm, v) for rk, rm, v in right if rk == k and rm <= m]
        want = max(cands, key=lambda t: (t[0], t[1]))[1] if cands else None
        assert got[eid] == want, (eid, k, m, cands)


def test_asof_join_null_value_column_same_row(spark):
    """All value columns must come from the SAME matched right row, even
    when that row carries a NULL in one of them — a per-column last()
    would stitch v1 from an older row with v2 from the newer one."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-05"))], "eid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01"), 1.0, 111.0),
            (10, _ts("2024-01-03"), None, 333.0),  # newest match: v1 is NULL
        ],
        "k long, rts timestamp, v1 double, v2 double",
    )
    row = asof_join(left, right, "k", "k", "ts", "rts", ["v1", "v2"]).collect()[0]
    assert row["v2"] == 333.0
    assert row["v1"] is None  # from the SAME (newest) row, not 1.0 from the older one


def test_asof_join_property_random(spark):
    """Property test: asof_join over random (key, ts, tiebreak, value)
    tables matches a straightforward per-row Python reference (latest
    right row at-or-before the left ts; greatest tiebreak among ties).
    Exercises duplicate timestamps, keys missing on either side, and
    tiebreak collisions that the hand-written cases cannot enumerate."""
    from hypothesis import given, settings, strategies as st

    row = st.tuples(
        st.integers(0, 3),  # key: few keys -> dense collisions
        st.integers(0, 6),  # ts
        st.integers(0, 2),  # tiebreak
        st.integers(0, 100),  # value
    )

    @settings(max_examples=6, deadline=None)
    @given(
        left=st.lists(row, min_size=1, max_size=12),
        right=st.lists(row, min_size=1, max_size=12),
    )
    def run(left, right):
        ldf = spark.createDataFrame(
            [(i, k, t) for i, (k, t, _, _) in enumerate(left)],
            "lid long, k long, t long",
        )
        rdf = spark.createDataFrame(
            [(k, t, tb, float(v)) for (k, t, tb, v) in right],
            "k long, t long, tb long, v double",
        )
        got = {
            r["lid"]: (r["v"], r["tb"])
            for r in asof_join(
                ldf, rdf, left_key="k", right_key="k", left_ts="t",
                right_ts="t", value_cols=["v", "tb"], tiebreak="tb",
            ).collect()
        }
        for i, (k, t, _, _) in enumerate(left):
            cands = [(rt, tb, v) for (rk, rt, tb, v) in right if rk == k and rt <= t]
            if not cands:
                assert got[i] == (None, None), f"lid={i}: expected null, got {got[i]}"
            else:
                best_t = max(c[0] for c in cands)
                best_tb = max(c[1] for c in cands if c[0] == best_t)
                best_v = max(float(c[2]) for c in cands if c[0] == best_t and c[1] == best_tb)
                # value for the (best_t, best_tb) row; if several rows share
                # both, the operator may return any of them -> compare the
                # (t, tb) choice, and the value only when it is unique
                vals = {float(c[2]) for c in cands if c[0] == best_t and c[1] == best_tb}
                assert got[i][1] == best_tb, f"lid={i}: tiebreak {got[i]} != {best_tb}"
                if len(vals) == 1:
                    assert got[i][0] == best_v, f"lid={i}: value {got[i]} != {best_v}"

    run()


def test_fuzzy_pairs_by_deletion_complete_vs_bruteforce(spark):
    """Completeness of the deletion-neighborhood join: on random short
    strings (alphabet small enough to force near-collisions, lengths 0-6
    to hit the empty/short-string guards), the candidate pairs at
    levenshtein <= 2 must EXACTLY equal the brute-force all-pairs answer
    — the pigeonhole argument is the whole basis of the rewrite, so it
    gets an independent check against Spark's own levenshtein."""
    import random

    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.operators.joins import fuzzy_pairs_by_deletion

    rng = random.Random(23)
    names = list({  # distinct names across 2 blocks
        (rng.randrange(2), "".join(rng.choice("ab1") for _ in range(rng.randrange(0, 7))))
        for _ in range(160)
    })
    df = spark.createDataFrame(
        [(b, n, 1 + (i % 3)) for i, (b, n) in enumerate(names)], "blk int, nm string, cnt int"
    )
    got = {
        (r["blk"], r["name_a"], r["name_b"]): r["distance"]
        for r in fuzzy_pairs_by_deletion(df, ["blk"], "nm").collect()
    }
    brute = df.alias("a").join(df.alias("b"), "blk").where(F.col("a.nm") < F.col("b.nm"))
    want = {
        (r["blk"], r["na"], r["nb"]): r["d"]
        for r in brute.select(
            "blk",
            F.col("a.nm").alias("na"),
            F.col("b.nm").alias("nb"),
            F.levenshtein("a.nm", "b.nm").cast("long").alias("d"),
        )
        .where(F.col("d") <= 2)
        .collect()
    }
    assert got == want, (
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )


def test_salted_join_equals_plain_join(spark):
    """salted_join must be row-identical to the plain equi-join (inner and
    left, including unmatched left rows); only physical distribution
    differs. Skewed fact: 80% of rows share one key."""
    from data_pipeline_agent_spark.operators.joins import salted_join

    fact = spark.range(1000).select(
        F.when(F.col("id") < 800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 10).alias("d"))

    for how in ("inner", "left"):
        got = salted_join(fact, dim, "k", n_salts=8, how=how)
        want = fact.join(dim, "k", how)
        g = sorted(map(tuple, got.select("k", "v", "d").collect()))
        w = sorted(map(tuple, want.select("k", "v", "d").collect()))
        assert g == w, f"salted {how} join diverged from plain join"
