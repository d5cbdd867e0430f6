"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized (count + a cheap checksum collect) so
lazy plans can't cheat the clock. A warm-up pass on sf0.001 triggers JVM/
codegen warm-up outside the timed region.
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    names = [n for n in HEADLINE if n in REGISTRY]
    names += [n for n in sorted(REGISTRY) if n not in names]

    # Warm-up: JVM + codegen + parquet footer caches, tiny sf
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for n in names[:3]:
            REGISTRY[n].spark(spark, warm).count()

    timings: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        df = REGISTRY[n].spark(spark, sf_dir)
        df.count()  # full materialization
        timings[n] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
