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
isolated sample (its min is the recorded time), and ``resweeps`` lists
every third-sampled query (capped; ``n_resweeps`` is the true count).

Round 7 (VERDICT r6 task 1): the r6 ``sweeps`` dict pushed the driver-facing
JSON line past the capture buffer and BENCH_r06.json came back
``parsed: null`` — the round-1 failure mode in a new guise.  Per-query
sweep samples now go to a SIDE FILE (``bench_sweeps.json`` next to this
script); the driver-facing line carries only the scalar summary + headline
timings + capped resweep names, and ``tests/test_bench_payload.py``
asserts the emitted line stays under the r1-safe budget.
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
    # r8: the round's new operator family — span-level dedup (the one
    # headline over documents; also rides the 10x scale ramp via HEADLINE)
    "dedup_duplicated_spans",
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


# The driver's capture buffer truncated a ~6 KB line in r1 and again in r6;
# ~3 KB was always captured intact.  build_payloads + the unit test pin the
# driver-facing line under this.
LINE_BUDGET = 3000

# Canary workload size: 64M generated longs, xxhash64 + bit_xor, 32 fixed
# partitions — pure JVM codegen, zero I/O, zero data dependence, one
# 32-row shuffle. ~0.35 s on this host when quiet.
CANARY_ROWS = 64_000_000


def run_canary(spark) -> float:
    """Fixed-cost host-speed calibration probe (r9, VERDICT r8 task 3).

    BENCH_r08 read ~1.3-1.5x above r7 on EVERY query including untouched
    plans — a host dilation episode covering the whole run, which
    best-of-2 + resweeps cannot normalize and which burned a full judge
    re-bench to adjudicate. The canary is a seeded, I/O-free, constant
    workload timed at sweep start / between sweeps / end: its samples
    measure the HOST, never the engine, so a cross-round comparison can
    deflate by canary ratio instead of re-litigating noise (convention
    recorded in SCALE.md). Same-host r7-equivalent quiet reading is the
    committed baseline in BENCH_r09's canary field."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(0, CANARY_ROWS, 1, 32).agg(
        F.bit_xor(F.xxhash64("id")).alias("sig")
    ).collect()
    return round(time.perf_counter() - t0, 3)


def build_payloads(headline, names, samples, resweeps, sf, canary=None,
                   canary_rs=None):
    """Split results into the small driver-facing line and the side file.

    Returns ``(payload, side)``: ``payload`` is the dict printed as the ONE
    JSON line the driver parses (headline timings + scalars only, resweep
    names capped so pathological dilation rounds can't regrow the line);
    ``side`` carries the full per-query sweep samples for human/judge use.

    r13 (VERDICT r12 finding 1, additions-only): the payload now also
    carries ``hsamples`` — every sweep sample for the HEADLINE queries
    (the set PERF compares round-over-round) — and ``canary_rs``, host
    probes taken during the resweep phase. Together they let PERF
    adjudicate dilation PER QUERY (two quiet sweeps + one dilated one is
    visible as a [q, q, 10q] triple; a real regression is [s, s] with a
    quiet canary) instead of per run. Existing keys are unchanged, so
    cross-round comparison with r12 stays valid; budget enforced by
    tests/test_bench_payload.py (headline is 27 names x <= 3 samples —
    bounded, unlike the full-registry dict that overflowed r1/r6).
    """
    timings = {n: min(s) for n, s in samples.items()}
    payload = {
        "metric": "headline_query_suite_runtime",
        "value": round(sum(timings[n] for n in headline), 3),
        "unit": "sec",
        "queries": {n: timings[n] for n in headline},
        "n_resweeps": len(resweeps),
        "resweeps": resweeps[:10],
        "full_total": round(sum(timings.values()), 3),
        "n_queries": len(names),
        "sf": float(sf) if str(sf).replace(".", "").isdigit() else sf,
        "hsamples": {n: samples[n] for n in headline},
    }
    if canary:
        # host-speed calibration samples (start/mid/end) + their min:
        # cross-round comparisons deflate by the canary ratio (r9)
        payload["canary"] = list(canary)
        payload["canary_min"] = min(canary)
    if canary_rs:
        payload["canary_rs"] = list(canary_rs)
    side = {
        "sweeps": {n: samples[n] for n in names},
        "resweeps": resweeps,
        "timings": timings,
        "canary": list(canary or []),
        "canary_rs": list(canary_rs or []),
    }
    return payload, side


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
    # the first sweep doubles as the whole-registry warm-up pass. The
    # canary brackets the sweeps (start/mid/end) so the artifact records
    # the host's speed DURING the measurement window (r9; one unrecorded
    # warm-up run first so JIT/codegen warm-up doesn't read as dilation).
    run_canary(spark)
    samples: dict[str, list[float]] = {n: [] for n in names}
    canary = [run_canary(spark)]
    for _sweep in range(2):
        for n in names:
            samples[n].append(_time_one(n))
        canary.append(run_canary(spark))

    # r6: a >30% sweep disagreement means at least one sample crossed a
    # host-dilation episode — take a third isolated sample so the min is
    # a two-out-of-three consensus, and record the query name so the
    # artifact itself shows where dilation hit.
    resweeps = [
        n for n in names if max(samples[n]) > 1.3 * min(samples[n])
    ]
    # r13: probe host speed DURING the resweep phase (every 20 resweeps)
    # so a dilation episode that hits only the tail of the run is visible
    # in the artifact next to the samples it inflated
    canary_rs = []
    for i, n in enumerate(resweeps):
        samples[n].append(_time_one(n))
        if (i + 1) % 20 == 0:
            canary_rs.append(run_canary(spark))

    payload, side = build_payloads(
        headline, names, samples, resweeps, sf, canary, canary_rs
    )
    # Sweep samples go to a side file the driver never reads: the r6
    # ``sweeps`` dict in the main line overflowed the driver's capture
    # buffer (BENCH_r06 parsed: null).  The driver-facing line stays small.
    side_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_sweeps.json"
    )
    with open(side_path, "w") as fh:
        json.dump(side, fh, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
