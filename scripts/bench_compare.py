"""Canary-deflated round-over-round BENCH comparison (r9, VERDICT r8
task 3 follow-through).

BENCH_r{N}.json timings mix two signals: the engine's plans and the
host's speed during the measurement window (documented dilation
episodes inflated BENCH_r08 1.3-1.5x across every untouched query and
burned a judge re-bench to adjudicate). From r9 on, every bench run
records a fixed-cost host-speed canary (`bench.run_canary`); this tool
compares two BENCH artifacts with per-query ratios BOTH raw and
deflated by the canary ratio, so "the host was slower" and "the plan
got slower" are separable at a glance.

Usage: python scripts/bench_compare.py BENCH_r09.json BENCH_r10.json
       (older first; prints a JSON summary + a per-query table to
        stderr for humans)
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        art = json.load(f)
    # driver artifacts wrap the payload under "parsed"; bench.py's own
    # stdout line is the payload itself
    return art.get("parsed") or art


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold",
        type=float,
        default=1.3,
        help="flag queries whose DEFLATED ratio exceeds this",
    )
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    c_old = old.get("canary_min")
    c_new = new.get("canary_min")
    host_ratio = (c_new / c_old) if (c_old and c_new) else None

    rows = []
    for q, t_new in new["queries"].items():
        t_old = old["queries"].get(q)
        if t_old is None or t_old <= 0:
            continue
        raw = t_new / t_old
        defl = raw / host_ratio if host_ratio else None
        rows.append((q, t_old, t_new, round(raw, 3),
                     round(defl, 3) if defl else None))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else r[3]))

    flagged = [
        q for q, _o, t_new, raw, defl in rows
        if (defl if defl is not None else raw) > args.threshold and t_new > 1.0
    ]
    summary = {
        "old": args.old,
        "new": args.new,
        "canary_min_old": c_old,
        "canary_min_new": c_new,
        "host_speed_ratio": round(host_ratio, 3) if host_ratio else None,
        "headline_raw_ratio": round(new["value"] / old["value"], 3),
        "headline_deflated_ratio": (
            round(new["value"] / old["value"] / host_ratio, 3)
            if host_ratio
            else None
        ),
        "full_raw_ratio": round(new["full_total"] / old["full_total"], 3),
        "full_deflated_ratio": (
            round(new["full_total"] / old["full_total"] / host_ratio, 3)
            if host_ratio
            else None
        ),
        "flagged_deflated_regressions": flagged,
        "note": (
            None
            if host_ratio
            else "older artifact has no canary (pre-r9); ratios are RAW — "
            "deflation unavailable, treat regressions as unadjudicated"
        ),
    }
    print(json.dumps(summary))
    print(f"{'query':<36} {'old':>8} {'new':>8} {'raw':>6} {'defl':>6}",
          file=sys.stderr)
    for q, t_old, t_new, raw, defl in rows:
        print(
            f"{q:<36} {t_old:>8.3f} {t_new:>8.3f} {raw:>6} "
            f"{defl if defl is not None else '-':>6}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
