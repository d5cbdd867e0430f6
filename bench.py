"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a row-count + XOR-of-xxhash64 checksum over
every output column, so Catalyst cannot prune unreferenced projection or
window expressions the way a bare ``count()`` allows — projection-only
queries (json_extract, datetime expansion, text features) are timed for the
work they actually claim to do.  A warm-up pass on sf0.001 triggers JVM/
codegen warm-up outside the timed region.

Output is capped to the headline per-query dict (the full registry is ~75
queries; printing all of them overflowed the driver's capture buffer in
round 1 and left BENCH_r01.json unparsed).  The full-suite total still runs
and is reported as the scalar ``full_total``/``n_queries`` fields.

Round 5 (VERDICT r4 task 2): per-query best-of-2 with a full warm-up
sweep, the same discipline as ``scripts/profile_all.py``.  The host shows
intermittent wall-clock-dilation episodes that can inflate a contiguous
block of queries 10x within a single sweep (SCALE.md); a single-pass
timing therefore measures the host, not the engine — BENCH_r04 read +44%
on the full registry while the isolated best-of-2 profile read -15%.
min-of-2 across two interleaved sweeps makes one dilation episode unable
to touch both samples of a query.

Round 6 (VERDICT r5 task 3): dilation episodes are now visible INSIDE the
artifact — any query whose two sweeps disagree by >30% gets a third
isolated sample (its min is the recorded time), per-headline-query sweep
samples are emitted under ``sweeps``, and ``resweeps`` lists every
third-sampled query (capped; ``n_resweeps`` is the true count).  A large
``n_resweeps`` or wide ``sweeps`` spreads say "host dilation during this
run", closing the BENCH-vs-profile ambiguity the r5 verdict flagged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_agent_spark.plans import REGISTRY  # noqa: E402
from data_pipeline_agent_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "window_order_rank",
    "rollup_order_totals",
    "events_sessionize",
    "events_hourly_tumbling",
    "median_quantiles",
    "iqr_clip_quantity",
    "corr_matrix",
    "freq_encode_customer_name",
    "label_encode_orderstatus",
    "datetime_expand_orders",
    "histogram_extendedprice",
    "json_extract_props",
    "asof_last_order_before_event",
    "range_join_price_bands",
    "q4_order_priority",
    "q6_revenue_forecast",
    "cube_order_totals",
    "pivot_status_by_priority",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation",
    "q13_order_distribution",
    "q18_large_volume_customers",
]


def _materialize(df) -> None:
    """Force evaluation of EVERY output column, not just row existence.

    ``count()`` lets Catalyst prune unreferenced projections (a
    projection-only query then times little more than the scan).  XOR of
    xxhash64 over all columns evaluates the full row; bit_xor keeps the
    aggregate overflow-free under ANSI mode (a long sum could throw).
    """
    from pyspark.sql import functions as F

    df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("sig"),
    ).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    # ERROR, not WARN: the r3 bench log was 90% WindowExec "no partition
    # defined" warnings from deliberately bounded-grain windows; the
    # driver's capture window must spend its bytes on the JSON line below
    # (the r1 truncation failure in a new guise).
    spark.sparkContext.setLogLevel("ERROR")

    headline = [n for n in HEADLINE if n in REGISTRY]
    names = headline + [n for n in sorted(REGISTRY) if n not in headline]

    # Warm-up: JVM + codegen + parquet footer caches, tiny sf
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for n in names[:3]:
            _materialize(REGISTRY[n].spark(spark, warm))

    def _time_one(n: str) -> float:
        t0 = time.perf_counter()
        _materialize(REGISTRY[n].spark(spark, sf_dir))
        dt = round(time.perf_counter() - t0, 3)
        # Query functions persist() intermediates (bands, shingles)
        # that no one unpersists; 90+ queries in one session otherwise
        # accumulate cached partitions (GC pressure skews later
        # timings) and identical plans silently reuse a prior query's
        # cache (flatters the numbers).
        spark.catalog.clearCache()
        return dt

    # best-of-2: two full sweeps, min per query (see module docstring) —
    # the first sweep doubles as the whole-registry warm-up pass
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _sweep in range(2):
        for n in names:
            samples[n].append(_time_one(n))

    # r6: a >30% sweep disagreement means at least one sample crossed a
    # host-dilation episode — take a third isolated sample so the min is
    # a two-out-of-three consensus, and record the query name so the
    # artifact itself shows where dilation hit.
    resweeps = [
        n for n in names if max(samples[n]) > 1.3 * min(samples[n])
    ]
    for n in resweeps:
        samples[n].append(_time_one(n))

    timings = {n: min(s) for n, s in samples.items()}
    headline_total = round(sum(timings[n] for n in headline), 3)
    full_total = round(sum(timings.values()), 3)
    # Per-query detail only for the headline suite: the full ~75-query dict
    # overflowed the driver's capture buffer in round 1 (parsed: null).
    print(
        json.dumps(
            {
                "metric": "headline_query_suite_runtime",
                "value": headline_total,
                "unit": "sec",
                "queries": {n: timings[n] for n in headline},
                "sweeps": {n: samples[n] for n in headline},
                "n_resweeps": len(resweeps),
                "resweeps": resweeps[:40],
                "full_total": full_total,
                "n_queries": len(names),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
