"""The driver-facing bench line must stay under the capture-buffer budget.

BENCH_r01 and BENCH_r06 both came back ``parsed: null`` because the single
output line outgrew the driver's capture buffer (r1: full per-query dict;
r6: per-query sweep samples).  ``bench.build_payloads`` now routes sweep
detail to a side file; this test pins the driver-facing line under the
r1-safe budget with worst-case-shaped inputs so the failure mode cannot
recur silently.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _fake_inputs(n_registry: int, n_resweeps: int):
    headline = list(bench.HEADLINE)
    extras = [f"registry_query_with_a_long_name_{i:03d}" for i in range(n_registry)]
    names = headline + extras
    # worst-case float widths: three samples each, full precision survives
    # min() but timings are already rounded to 3dp by _time_one
    samples = {n: [123.456, 234.567, 345.678] for n in names}
    resweeps = names[:n_resweeps]
    return headline, names, samples, resweeps


def test_driver_line_under_budget():
    headline, names, samples, resweeps = _fake_inputs(
        n_registry=200, n_resweeps=200
    )
    payload, side = bench.build_payloads(
        headline, names, samples, resweeps, "0.1",
        canary=[123.456, 234.567, 345.678],
        # worst case: a resweep-phase canary probe every 20 of 200+ resweeps
        canary_rs=[123.456] * 12,
    )
    line = json.dumps(payload)
    assert len(line) < bench.LINE_BUDGET, (
        f"driver-facing bench line is {len(line)} bytes, "
        f"budget {bench.LINE_BUDGET} — BENCH would come back parsed:null"
    )
    # the detail the line no longer carries must be in the side payload
    assert set(side["sweeps"]) == set(names)
    assert side["resweeps"] == resweeps


def test_payload_fields_present():
    headline, names, samples, resweeps = _fake_inputs(n_registry=5, n_resweeps=2)
    payload, side = bench.build_payloads(
        headline, names, samples, resweeps, "0.1", canary=[0.41, 0.35, 0.52],
        canary_rs=[0.44],
    )
    for key in ("metric", "value", "unit", "queries", "n_resweeps",
                "full_total", "n_queries", "sf", "canary", "canary_min",
                "hsamples", "canary_rs"):
        assert key in payload
    assert payload["sf"] == 0.1
    assert payload["n_queries"] == len(names)
    assert set(payload["queries"]) == set(headline)
    # timings are min-of-samples
    assert payload["queries"][headline[0]] == 123.456
    # the host-speed calibration samples ride both payloads (r9)
    assert payload["canary"] == [0.41, 0.35, 0.52]
    assert payload["canary_min"] == 0.35
    assert side["canary"] == [0.41, 0.35, 0.52]
    # r13 per-query dilation adjudication: every headline sweep sample is
    # in the main line, and the resweep-phase canaries ride along
    assert set(payload["hsamples"]) == set(headline)
    assert payload["hsamples"][headline[0]] == [123.456, 234.567, 345.678]
    assert payload["canary_rs"] == [0.44]
    assert side["canary_rs"] == [0.44]


def test_payload_without_canary_still_builds():
    headline, names, samples, resweeps = _fake_inputs(n_registry=5, n_resweeps=2)
    payload, side = bench.build_payloads(headline, names, samples, resweeps, "0.1")
    assert "canary" not in payload
    assert side["canary"] == []


def test_bench_compare_deflates_by_canary(tmp_path):
    """scripts/bench_compare.py: a 2x host slowdown with unchanged plans
    must deflate to ~1.0 (nothing flagged); without canaries the tool
    must report raw ratios with the unadjudicated note."""
    import json
    import subprocess

    old = {
        "value": 10.0, "full_total": 20.0, "canary_min": 0.2,
        "queries": {"q1": 2.0, "q2": 3.0},
    }
    new = {
        "value": 20.0, "full_total": 40.0, "canary_min": 0.4,
        "queries": {"q1": 4.0, "q2": 6.0},
    }
    p_old, p_new = tmp_path / "old.json", tmp_path / "new.json"
    p_old.write_text(json.dumps(old))
    p_new.write_text(json.dumps(new))
    out = subprocess.run(
        ["python", "scripts/bench_compare.py", str(p_old), str(p_new)],
        capture_output=True, text=True, check=True,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
    s = json.loads(out.stdout)
    assert s["host_speed_ratio"] == 2.0
    assert s["headline_deflated_ratio"] == 1.0
    assert s["full_deflated_ratio"] == 1.0
    assert s["flagged_deflated_regressions"] == []

    # pre-canary artifact: raw only, note present
    del old["canary_min"]
    p_old.write_text(json.dumps(old))
    out = subprocess.run(
        ["python", "scripts/bench_compare.py", str(p_old), str(p_new)],
        capture_output=True, text=True, check=True,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
    s = json.loads(out.stdout)
    assert s["host_speed_ratio"] is None
    assert s["headline_raw_ratio"] == 2.0
    assert "no canary" in s["note"]
