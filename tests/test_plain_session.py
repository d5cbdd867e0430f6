"""plain_loop_session / reroot (r12): the AQE-off child session that the
BPE trainer routes its merge rounds through.

- the child session must actually have AQE off while the caller's
  session keeps it on (scoping is the whole point — the r8 hazard
  forbids mutating session-global conf mid-loop);
- the child is cached per parent session (one extra session per app,
  not one per training call);
- reroot must preserve rows and schema across sessions and must not
  leak its bridge view in the global temp catalog.
"""

from pyspark.sql import functions as F

from data_pipeline_agent_spark.session import plain_loop_session, reroot


def test_plain_session_scoped_and_cached(spark):
    s2 = plain_loop_session(spark)
    assert s2 is not spark
    assert s2.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # same context (shared RDDs/cache), cached child
    assert s2.sparkContext is spark.sparkContext
    assert plain_loop_session(spark) is s2


def test_reroot_round_trip_no_view_leak(spark):
    s2 = plain_loop_session(spark)
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    before = set(
        r.name for r in spark.catalog.listTables("global_temp")
    )
    child = reroot(df, s2)
    # frame computes in the child session with identical content
    assert child.sparkSession is s2
    assert child.schema == df.schema
    assert child.count() == 100
    agg = child.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    assert "AdaptiveSparkPlan" not in agg._jdf.queryExecution().executedPlan().toString()
    # ... and back, under the parent's AQE
    back = reroot(child, spark)
    assert back.sparkSession is spark
    assert sorted(r.id for r in back.collect()) == list(range(100))
    after = set(r.name for r in spark.catalog.listTables("global_temp"))
    assert after == before  # bridge views dropped, nothing accumulates
