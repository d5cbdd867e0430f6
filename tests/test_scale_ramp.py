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
    pairs at the big tier), and replica 0 must be the identity. The 100x
    documents tier needs the full 100-translation budget."""
    from scripts.scale_ramp import _rep_translation

    seen = {_rep_translation(r) for r in range(100)}
    assert len(seen) == 100
    src, dst = _rep_translation(0)
    assert src == dst


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lcs(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def test_name_suffix_code_edit_distance_and_lcs():
    """The customer-name replica codes must sit pairwise at EDIT distance
    >= 3 (any pair closer puts same-base replica names inside the fuzzy
    query's distance-2 threshold, inflating true matches ~reps^2) AND at
    LCS <= len-3 (an LCS of len-2 means two replicas share a 2-deletion
    variant, so every same-base cross-replica pair becomes a FALSE
    candidate the verify stage must reject — a ~reps^2 cost term).
    Hamming-distance codes fail the first property via shift pairs
    ("0123"/"1234" = Levenshtein 2); verified exhaustively."""
    from scripts.scale_ramp import _name_suffix

    codes = [_name_suffix(r) for r in range(100)]
    assert len(set(codes)) == 100
    n = len(codes[0])
    for i in range(100):
        for j in range(i + 1, 100):
            assert _levenshtein(codes[i], codes[j]) >= 3, (codes[i], codes[j])
            assert _lcs(codes[i], codes[j]) <= n - 3, (codes[i], codes[j])


def test_embedding_transforms_injective():
    """The dihedral dimension-permutation family must be injective for
    rep < 2*dim — a collision makes two replicas byte-identical vectors
    of the same base row, the exact reps^2 dup-pair inflation the
    transform exists to prevent. rep 0 must be the identity."""
    from scripts.scale_ramp import _emb_transform

    dim = 64
    seen = {_emb_transform(r, dim) for r in range(2 * dim)}
    assert len(seen) == 2 * dim
    assert _emb_transform(0, dim) == (0, False)


@pytest.fixture(scope="module")
def ramp100():
    artifact = os.path.join(REPO, "scale_ramp_100x.json")
    if not os.path.exists(artifact):
        pytest.skip("scale_ramp_100x.json not generated yet (scale_ramp.py --tier100)")
    with open(artifact) as f:
        return json.load(f)


def test_tier100_covers_doc_and_embedding_families(ramp100):
    """The second-decade tier must probe the heaviest relational AND
    document/embedding plans (round-6 verdict task 1)."""
    for q in (
        "q18_large_volume_customers",
        "q5_regional_revenue",
        "median_quantiles",
        "fuzzy_match_customer_names",
        "dedup_minhash_groups",
        "dedup_semantic_clusters",
        "dedup_survivor_best_quality",
        "grouped_percentiles_totalprice",
        "corpus_shuffle_shards",
        # r9 (verdict r8 tasks 2+5)
        "dedup_span_partners",
        "dedup_span_share",
        "ml_als_recommend_parts",
        "dedup_span_trim",
    ):
        assert q in ramp100["queries"], q


def test_tier100_nothing_super_linear(ramp100):
    assert ramp100["flagged"] == [], ramp100["flagged"]


@pytest.fixture(scope="module")
def stream_probe():
    artifact = os.path.join(REPO, "stream_probe.json")
    if not os.path.exists(artifact):
        pytest.skip("stream_probe.json not generated yet (scripts/stream_probe.py)")
    with open(artifact) as f:
        return json.load(f)


def test_stream_probe_covers_operator_families(stream_probe):
    """Throughput + state evidence for every streaming operator family:
    JVM windowed aggs (tumbling/sliding), watermark-bounded dedup, and
    the Python stateful path (round 6 — the batch families' scale story,
    extended to streams)."""
    for p in (
        "tumbling_counts",
        "sliding_counts",
        "dedup_stream",
        "user_lifetime_stats",
    ):
        assert p in stream_probe, p
        r = stream_probe[p]
        assert r["n_batches"] >= 5, (p, r["n_batches"])
        assert r["rows_per_sec"] > 0, p


def test_stream_probe_state_is_watermark_bounded(stream_probe):
    """The claim that decides survival on an unbounded stream: every
    stateful probe's state-row series must plateau (watermark eviction
    observed inside the run), never keep growing linearly. The series
    must be NON-EMPTY (r7, ADVICE r6): a probe whose progress records
    lack stateOperators entries observed nothing and must not pass."""
    for p, r in stream_probe.items():
        assert len(r["state_rows_series"]) >= 3, (p, "state series too short")
        assert r["state_bounded"], (p, r["state_rows_series"])


def test_split_sections_order_agnostic():
    """The three SCALE.md writers (main ramp, run_tier100, stream_probe)
    must compose in ANY run order (r7, ADVICE r6: the old splices assumed
    stream-always-after-100x, duplicating or dropping sections when
    stream_probe ran first)."""
    from scripts.scale_ramp import _split_sections

    base = "# SCALE\nbody\n"
    t100 = "\n## 100x tier: the second decade\nt100 body\n"
    stream = "\n## Streaming throughput & state probe (round 6)\nstream body\n"
    for txt in (base + t100 + stream, base + stream + t100, base + t100,
                base + stream, base):
        b, t, s = _split_sections(txt)
        assert b == base, repr(txt)
        assert t == (t100 if t100 in txt else "")
        assert s == (stream if stream in txt else "")
    # round-trip: re-appending normalizes to base + 100x + stream
    b, t, s = _split_sections(base + stream + t100)
    assert b + t + s == base + t100 + stream


def test_state_bounded_rejects_empty_series():
    """Unit gate on the detector itself: empty/short series = not
    observed = not bounded (the r6 vacuous-pass hole)."""
    from scripts.stream_probe import _state_bounded

    assert _state_bounded([]) is False
    assert _state_bounded([5]) is False
    assert _state_bounded([5, 5]) is False
    assert _state_bounded([5, 5, 5]) is True      # short but flat
    assert _state_bounded([1, 2, 3, 4, 5]) is False  # short and climbing
    assert _state_bounded(list(range(20))) is False  # linear growth
    assert _state_bounded([10, 20, 30, 32, 32, 32, 32, 32, 32]) is True
