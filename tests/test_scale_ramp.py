"""Gate on the scale-ramp artifact (scripts/scale_ramp.py -> scale_ramp.json).

The ramp itself runs minutes (generates a 10x sf1 tier and times the
headline suite at three SFs), so pytest gates the committed artifact
rather than re-measuring: the artifact must exist, cover the headline
suite, and contain no query flagged super-linear (runtime ratio > 1.5x
the data ratio while materially data-bound). Regenerate with
``python scripts/scale_ramp.py`` after plan-shape changes.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "scale_ramp.json")


@pytest.fixture(scope="module")
def ramp():
    if not os.path.exists(ARTIFACT):
        pytest.skip("scale_ramp.json not generated yet (run scripts/scale_ramp.py)")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_no_headline_query_super_linear(ramp):
    assert ramp["flagged"] == [], (
        f"queries scaling worse than 1.5x the data ratio: {ramp['flagged']}"
    )


def test_ramp_covers_headline_suite(ramp):
    from bench import HEADLINE

    measured = set(ramp["tiers"]["sf1"])
    missing = [n for n in HEADLINE if n not in measured]
    assert not missing, f"headline queries missing from the ramp: {missing}"


def test_suite_ratio_roughly_linear(ramp):
    # whole-suite wall ratio on 10x data: generous 1.5x-of-linear bound,
    # same rule as the per-query flag but aggregated (constant plan
    # overhead pushes this DOWN, so a pass is meaningful)
    tot = ramp["totals"]
    assert tot["sf1"] / tot["sf0.1"] <= 1.5 * ramp["reps"], tot


def test_replica_translations_injective():
    """Every replica's character translation must be distinct (a collision
    makes two replicas byte-identical text, inflating dedup candidate
    pairs at the big tier), and replica 0 must be the identity."""
    from scripts.scale_ramp import _rep_translation

    seen = {_rep_translation(r) for r in range(25)}
    assert len(seen) == 25
    src, dst = _rep_translation(0)
    assert src == dst
