"""Sweep ivfpq_topk's nprobe x rerank dials and measure composed recall
vs the exact brute-force top-5 (r11, r10 verdict task 1).

Prints one JSON line per (sf, nprobe, rerank) with the aggregate recall
of the 10 probe anchors' exact top-5 slots, plus the isolated wall-clock
of the composed query — the evidence for choosing the registry dials and
setting IVFPQ_RECALL_FLOOR just under the measured floor.

Usage: python scripts/ivfpq_sweep.py [--out ivfpq_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# (nprobe, rerank, m): the r11 decision path — the r10 registry dials,
# each dial raised alone, and the chosen composition (8, 50, 16)
GRID = [(4, 25, 8), (8, 25, 8), (8, 50, 8), (8, 50, 16)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ivfpq_sweep.json")
    args = ap.parse_args()

    from data_pipeline_agent_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )
    from data_pipeline_agent_spark.session import get_spark

    spark: SparkSession = get_spark()
    rows = []
    for sf in SFS:
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        anchors = emb.where(F.col("vec_id") < 10)
        exact = brute_force_topk(emb, anchors, k=5).collect()
        top5: dict[int, set[int]] = {}
        for r in exact:
            top5.setdefault(r.query_id, set()).add(r.neighbor_id)
        total = sum(len(v) for v in top5.values())
        for nprobe, rerank, m in GRID:
            t0 = time.monotonic()
            got = ivfpq_topk(
                emb, anchors, k=5, n_centroids=16, nprobe=nprobe,
                m=m, rerank=rerank,
            ).collect()
            dt = time.monotonic() - t0
            mine: dict[int, set[int]] = {}
            for r in got:
                mine.setdefault(r.query_id, set()).add(r.neighbor_id)
            hits = sum(len(top5[q] & mine.get(q, set())) for q in top5)
            row = {
                "sf": sf.rsplit("sf", 1)[-1],
                "nprobe": nprobe,
                "rerank": rerank,
                "m": m,
                "recall": round(hits / total, 4),
                "hits": hits,
                "total": total,
                "sec": round(dt, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
