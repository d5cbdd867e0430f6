"""Split a registry query's cost into BUILD vs EXEC (r12 instrument).

``profile.json`` times one number per query, but that number mixes two
very different costs:

- **build**: calling ``REGISTRY[n].spark(spark, sf_dir)`` — pure
  driver-side work: Python plan construction, py4j round-trips, and any
  collects / eager persists / checkpoint jobs the builder runs
  internally (percentile passes, CC closure rounds, BPE training
  rounds, KMeans fits ...);
- **exec**: materializing the RETURNED DataFrame (count + xxhash64 XOR
  over all columns, the bench's materializer) — the final plan's
  analysis + execution.

Optimizations attack the two differently (guide §1.1: know where the
time goes before changing anything), so this instrument times them
separately, best-of-2 per query with a clearCache between samples.

    python scripts/build_exec_profile.py [names...] [--top N] [--out F]

With no names, profiles the --top N slowest queries from profile.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_agent_spark.plans import REGISTRY  # noqa: E402
from data_pipeline_agent_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    names = args.names
    if not names:
        with open(
            os.path.join(os.path.dirname(__file__), "..", "profile.json")
        ) as fh:
            prof = json.load(fh)
        names = [
            k
            for k, _v in sorted(prof.items(), key=lambda x: -x[1])
            if "@" not in k
        ][: args.top]

    spark = get_spark("build_exec_profile")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    def mat(df):
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("sig"),
        ).collect()

    # warm-up
    for n in names[:2]:
        mat(REGISTRY[n].spark(spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for _sweep in range(2):
        for n in names:
            spark.sparkContext.setJobDescription(f"bx:{n}")
            t0 = time.perf_counter()
            df = REGISTRY[n].spark(spark, args.sf_dir)
            t1 = time.perf_counter()
            mat(df)
            t2 = time.perf_counter()
            spark.catalog.clearCache()
            d = out.setdefault(n, {"build": [], "exec": []})
            d["build"].append(round(t1 - t0, 3))
            d["exec"].append(round(t2 - t1, 3))

    summary = {
        n: {
            "build": min(d["build"]),
            "exec": min(d["exec"]),
            "total": round(min(d["build"]) + min(d["exec"]), 3),
            "samples": d,
        }
        for n, d in out.items()
    }
    for n, s in sorted(summary.items(), key=lambda x: -x[1]["total"]):
        print(
            f"{s['total']:7.2f}  build={s['build']:6.2f}  exec={s['exec']:6.2f}"
            f"  {n}"
        )
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
