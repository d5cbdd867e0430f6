"""Scale-ramp harness: does each headline query's runtime stay ~linear in
data size? The brief's real question is 100x, so this measures the 10x
step directly: it synthesizes an sf1-equivalent dataset by tiling sf0.1
ten times (no network, so no DuckDB tpch generator), runs the headline
suite at sf0.01 / sf0.1 / sf1, and reports per-query runtime ratios
against the 10x data ratio.

Tiling details (what makes the tiled data a fair scaling proxy):

- Every SF-scaling key domain (custkey, orderkey, partkey, suppkey,
  event/user/doc/vec ids) is offset per replica by a stride larger than
  the base domain, so join fan-outs and group cardinalities scale the
  way TPC-H SF does (10x keys, not 10x duplicates of the same key).
- region/nation are copied, not tiled — they are fixed dimensions at
  every SF, and tiling them would *shrink* relative selectivity.
- Dates/timestamps keep the base range: TPC-H's calendar spans a fixed
  7 years at every SF, so day/month-grain windows stay bounded — tiling
  must not turn a calendar-bounded grain into a scaling one.
- documents.text gets a per-replica vowel rotation (F.translate): plain
  copies would be EXACT near-dups of each other, inflating the LSH
  candidate-pair count ~reps^2 instead of the ~reps x a real corpus
  grows — the dedup queries would be falsely flagged super-linear.
- embeddings get a deterministic per-replica, per-dimension nudge so
  ANN bucket occupancy scales instead of collapsing 10 replicas into
  identical vectors.

Usage:
    python scripts/scale_ramp.py                 # full ramp -> SCALE.md
    python scripts/scale_ramp.py --skip-gen      # reuse generated sf1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import HEADLINE, _materialize  # noqa: E402
from data_pipeline_agent_spark.plans import REGISTRY  # noqa: E402
from data_pipeline_agent_spark.session import get_spark  # noqa: E402

SCALED_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale/sf1")

# Per-table SF-scaling key columns; each is offset by rep * stride where
# stride = (max over the table's own domain) + 1, so cross-table joins
# stay consistent (lineitem.l_partkey strides by PART's domain, etc.).
_KEY_DOMAINS = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
_DOMAIN_KEY = {
    "customer": ("customer", "c_custkey"),
    "orders": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supplier": ("supplier", "s_suppkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}
_COPY_TABLES = ("region", "nation")

# Tiling-scheme version, stamped into every generated table dir and
# checked by --skip-gen reuse (r7). BUMP THIS whenever any tiling
# transform changes semantics (translations, name suffixes, embedding
# transforms, key strides) — a stale stamp forces regeneration instead of
# silently measuring fidelity-broken data.
TILE_SCHEME = "v2-r6:namesfx6+rot100+dihedral-emb"

_VOWELS = "aeiou"
# 20 consonants x 5 vowels = 100 distinct translations — the 100x tier
# tiles documents with reps=100 (round 6; was "bcdfg" = 25 translations)
_CONSONANTS = "bcdfghjklmnpqrstvwxz"

# Disjoint symbol alphabets for the customer-name replica code (see
# _name_suffix); both disjoint from the base-name charset matters less
# than their disjointness from EACH OTHER (that is what bounds LCS)
_CODE_A = "ABCDEFGHIJ"
_CODE_B = "KLMNOPQRST"


def _rep_translation(rep: int) -> tuple[str, str]:
    """Injective per-replica character translation for rep < 100.

    A bare vowel rotation collides at rep % 5 == 0 (rotation by 5 is the
    identity), which would make replicas r and r+5 byte-identical — the
    exact-duplicate inflation the rotation exists to prevent. Composing a
    vowel rotation (5 states) with an independent consonant rotation
    (20 states) gives 100 distinct translations; rep 0 is the identity,
    so replica 0 keeps the original text verbatim."""
    rv = rep % len(_VOWELS)
    rc = (rep // len(_VOWELS)) % len(_CONSONANTS)
    src = _VOWELS + _CONSONANTS
    dst = (
        _VOWELS[rv:] + _VOWELS[:rv] + _CONSONANTS[rc:] + _CONSONANTS[:rc]
    )
    return src, dst


def _name_suffix(rep: int) -> str:
    """6-char replica code with pairwise EDIT distance >= 3 and pairwise
    LCS <= 3, for tiling customer NAMES (round 6 tiling-fidelity fix).

    The tiler offsets c_custkey but previously left c_name untouched, so
    every replica carried byte-identical names and the fuzzy-linkage
    query's dedupe-first grain collapsed to the base corpus — the 10x
    fuzzy measurement partly measured nothing. Regenerating names from
    the offset custkey would be faithful to TPC-H's dense id space, but
    dense 9-digit ids put ~quadratically many TRUE pairs within edit
    distance 2 (any two ids differing in <=2 digit positions), drowning
    the ramp in output-proportional cost the way no natural-language
    name corpus does. The fair proxy (same policy as the documents
    vowel rotation and the embedding dimension shift): replicas get
    DISTINCT names that never match each other, so true-match counts
    scale ~linearly with reps like a real corpus.

    Hamming distance is NOT enough here: a Reed-Solomon [4,2,3] code has
    min Hamming distance 3, but its codewords are arithmetic progressions
    and a one-step shift pair like "0123"/"1234" sits at LEVENSHTEIN
    distance 2 (delete front, append back) — inside the fuzzy threshold.
    Construction instead: code(rep) = (s1 s2)^3 alternating two symbols
    drawn from DISJOINT alphabets, (s1, s2) unique per rep. Disjointness
    means any alignment can only match s1<->s1 and s2<->s2, so two
    distinct codes differ in >= 3 substitutions (edit distance >= 3, no
    spurious true matches) and share an LCS of <= 3 < len-2 = 4 (no
    shared 2-deletion variant, so same-base replica pairs never even
    reach the candidate join — the false-candidate term stays zero
    instead of growing ~reps^2)."""
    if rep >= len(_CODE_A) * len(_CODE_B):
        raise ValueError("name-suffix code supports at most 100 replicas")
    s1, s2 = _CODE_A[rep // 10], _CODE_B[rep % 10]
    return (s1 + s2) * 3


def _tile(df: DataFrame, keys: dict[str, int], reps: int, table: str) -> DataFrame:
    """reps copies in ONE pass: explode a replica index, offset every
    scaling key by rep * its domain stride."""
    out = df.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
    for col, stride in keys.items():
        out = out.withColumn(
            col, (F.col(col) + F.col("__rep") * F.lit(stride)).cast(df.schema[col].dataType)
        )
    if table == "customer":
        # distinct, near-dup-safe names per replica (see _name_suffix:
        # pairwise edit distance >= 3 between any two replica codes, so
        # the fuzzy-linkage true-match count scales ~linearly with reps
        # instead of collapsing to the base grain or exploding ~reps^2)
        suffixes = F.array(*[F.lit("-" + _name_suffix(r)) for r in range(reps)])
        out = out.withColumn(
            "c_name",
            F.concat(F.col("c_name"), F.element_at(suffixes, F.col("__rep") + 1)),
        )
    if table == "documents":
        # per-replica vowel rotation: replicas are no longer near-dups of
        # each other, so LSH candidate pairs scale ~linearly like a real
        # corpus (replica 0 keeps the original text verbatim)
        budget = len(_VOWELS) * len(_CONSONANTS)
        if reps > budget:
            raise ValueError(
                f"tiling supports at most {budget} replicas "
                f"({budget} distinct translations)"
            )
        txt = F.col("text")
        for r in range(1, reps):
            src, dst = _rep_translation(r)
            txt = F.when(
                F.col("__rep") == r,
                F.translate(F.col("text"), src, dst),
            ).otherwise(txt)
        out = out.withColumn("text", txt).withColumn("n_chars", F.length("text"))
    if table == "embeddings":
        # per-replica dimension permutation: a small additive nudge
        # keeps replicas semantically near-identical (cosine ~1), which
        # grows the true duplicate-pair graph ~reps^2 and falsely brands
        # SemDeDup/cosine-dedup super-linear; permuting the dimensions
        # makes replicas of the same base vector mutually near-orthogonal
        # (like a real 10x corpus) while each replica keeps the base
        # value distribution exactly. rep 0 is the identity.
        dim_row = df.select(F.size("embedding").alias("d")).first()
        dim = int(dim_row["d"])
        if reps > 2 * dim:
            raise ValueError(
                f"embedding tiling supports at most {2 * dim} replicas "
                "(dihedral transform budget)"
            )
        emb = F.col("embedding")
        shifted = emb
        for r in range(1, reps):
            k, reflect = _emb_transform(r, dim)
            expr = (
                F.concat(F.slice(emb, k + 1, dim - k), F.slice(emb, 1, k))
                if k
                else emb
            )
            if reflect:
                expr = F.reverse(expr)
            shifted = F.when(F.col("__rep") == r, expr).otherwise(shifted)
        out = out.withColumn("embedding", shifted)
    return out.drop("__rep")


def _emb_transform(rep: int, dim: int) -> tuple[int, bool]:
    """Per-replica dihedral dimension permutation: (rotation k, reflect?).

    Rotations alone run out at ``dim`` replicas — for dim=64 and
    reps=100, replicas 64..99 would repeat the shifts of 0..35, making
    those replica pairs byte-identical vectors of the same base row
    (exactly the reps^2 dup-pair inflation the shift exists to prevent).
    The second lap therefore composes the rotation with a reversal:
    rotations and reflections are distinct permutations for dim > 2, so
    the dihedral family gives 2*dim distinct transforms, injective in
    rep for rep < 2*dim (gcd(13, 64) = 1 keeps each lap's rotations
    distinct). rep 0 is the identity."""
    return (rep * 13) % dim, (rep // dim) % 2 == 1


def generate_scaled(
    spark: SparkSession,
    base_dir: str,
    out_dir: str,
    reps: int,
    tables: set[str] | None = None,
    reuse: bool = False,
) -> None:
    """``tables`` restricts tiling to a subset (plus the copied dims) —
    the 100x tier only needs the tables its probe queries touch.
    ``reuse=True`` skips any table whose output directory already exists
    (generation is minutes at reps=100; reruns after a partial failure
    should not redo finished tables)."""
    strides = {}
    for dom, (tbl, key) in _DOMAIN_KEY.items():
        mx = (
            spark.read.parquet(f"{base_dir}/{tbl}.parquet")
            .agg(F.max(key).alias("m"))
            .first()["m"]
        )
        strides[dom] = int(mx) + 1
    os.makedirs(out_dir, exist_ok=True)
    n_wide = spark.sparkContext.defaultParallelism

    # Scheme-version marker per generated table dir (r7, ADVICE r6):
    # ``reuse`` used to skip ANY existing directory, silently measuring
    # against tiles from an older fidelity-broken scheme (pre-r6: no name
    # suffixes, 25-translation rotation, shift-only embeddings) or a
    # partially-failed write (no marker — it is written only AFTER a
    # completed parquet write). The underscore prefix makes Spark's
    # parquet reader ignore the marker file, like _SUCCESS.
    def _marker(tbl: str) -> str:
        return f"{out_dir}/{tbl}.parquet/_TILE_SCHEME"

    def _fresh(tbl: str) -> bool:
        try:
            with open(_marker(tbl)) as fh:
                return fh.read().strip() == f"{TILE_SCHEME} reps={reps}"
        except OSError:
            return False

    def _stamp(tbl: str) -> None:
        with open(_marker(tbl), "w") as fh:
            fh.write(f"{TILE_SCHEME} reps={reps}")

    for tbl in _COPY_TABLES:
        if reuse and _fresh(tbl):
            continue
        spark.read.parquet(f"{base_dir}/{tbl}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{tbl}.parquet"
        )
        _stamp(tbl)
    for tbl, keys in _KEY_DOMAINS.items():
        if tables is not None and tbl not in tables:
            continue
        if reuse and _fresh(tbl):
            continue
        # the base files are single-row-group -> the explode would run on
        # one core; spread the source rows first (order-independent)
        df = spark.read.parquet(f"{base_dir}/{tbl}.parquet").repartition(n_wide)
        tiled = _tile(df, {c: strides[d] for c, d in keys.items()}, reps, tbl)
        tiled.write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")
        _stamp(tbl)


def time_suite(
    spark: SparkSession,
    sf_dir: str,
    names: list[str],
    sweeps: int = 2,
    counts_out: dict[str, int] | None = None,
) -> dict[str, float]:
    """Per-query best-of-``sweeps`` — the host shows intermittent
    wall-clock-dilation episodes that can inflate a contiguous block of
    queries 10x+ in a single sweep (observed and re-measured in
    isolation); the min of two independent sweeps rejects any episode
    shorter than a whole sweep.

    r7: bench.py's resweep rule, ported here after an sf10 tier run where
    one episode covered BOTH samples of the two longest queries (fuzzy
    read 282 s vs 151 s in a clean run minutes earlier) — any query whose
    sweep samples disagree by >30% gets a third isolated sample, so a
    single episode cannot decide a long query's recorded time."""
    samples: dict[str, list[float]] = {n: [] for n in names}

    def one(n: str) -> float:
        t0 = time.perf_counter()
        _materialize(REGISTRY[n].spark(spark, sf_dir))
        dt = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return dt

    for _ in range(sweeps):
        for n in names:
            samples[n].append(one(n))
    for n in names:
        if max(samples[n]) > 1.3 * min(samples[n]):
            samples[n].append(one(n))
    if counts_out is not None:
        # per-query sample count, so downstream tables can mark which rows
        # are min-of-2 vs min-of-N after resweeps/re-measures (ADVICE r8)
        counts_out.update({n: len(s) for n, s in samples.items()})
    return {n: min(s) for n, s in samples.items()}


AUDIT_APPENDIX = """
## Full-registry audit at the 10x tier (rounds 3-4)

All 130 registry queries were additionally run at the sf1 tier: zero
errors — re-confirmed in round 7 on the grown registry: all 134 queries
(including the new multimodal contract and all-points kNN-graph entries)
ran at the sf1 tile with zero errors, 275.7 s single-sweep total. Because the host shows intermittent wall-clock-dilation episodes
(a contiguous block of queries can read 10x+ slow in one sweep), every
suspicious ratio was re-measured in isolation before acting. Findings:

- `fuzzy_match_customer_names` was genuinely super-linear (~30x on 10x
  data: nation-only blocking = n^2/25 levenshtein pairs). Fixed with
  complete 2-deletion-neighborhood candidate generation
  (`operators/joins.py:fuzzy_pairs_by_deletion`); output-proportional at
  scale. Oracle unchanged, hash-green. (The "~flat across the tiers"
  this round originally measured was partly an artifact of the pre-r6
  tiling, whose replicas carried byte-identical names — with name
  fidelity fixed the honest 10x step decomposes into 10x distinct grain
  x the variant-neighborhood width from the longer suffixed names. R7
  reconciliation (the r6 prose quoted an isolated re-measure, 4.94x,
  that contradicted the committed tier artifact): the current tier
  artifact (scale_ramp_100x.json) measures the second decade at
  ~10-12x per 10x data (12.45x in the committed min-of-3 artifact;
  10.05x in the cleanest same-day run — residual spread is the host's
  documented dilation, not the plan), and the r7 decomposition run
  shows that ratio is data-intrinsic — distinct (nation, name) grain 150,000 -> 1,500,000
  (exactly 10x), avg name length 25 at both tiles (constant ~326-variant
  neighborhood), and true output pairs 1,633,830 -> 16,338,300 (exactly
  10.0x: the synthetic Customer#NNN name space is dense, so verify and
  output are the dominant linear terms). Runtime tracking the grain and
  output exactly is the intended operator shape; sub-10x would require
  the work to NOT scale with names. R6 also reshaped the operator: the r5
  localCheckpoint of the corpus-x-~326 variant explosion OOMed a 48 GiB
  heap at the sf10 tile; candidates now come from an explode-once
  per-(block, variant) group-pairing aggregate that never materializes
  a corpus-x-neighborhood frame.)
- `median_quantiles` was memory-unbounded (exact F.percentile buffers the
  column on one reducer). Replaced with scan-only distributed selection
  (`operators/ranking.py:exact_percentiles`). R6 floor note (the r5
  verdict's 1.5 s target): the multi-column request is two linear
  scan-side aggregate passes, but the sf0.1 testdata lineitem is ONE
  parquet row group, so every pass serializes onto a single task and
  pays the full ~0.6 s local job floor — measured best-of-3 is 2.12 s on
  the driver's single-row-group file vs 1.51 s on the same rows
  repartitioned into 32 files. The residual above 1.5 s is the
  single-file layout, not the plan; at any real multi-row-group scale
  the passes parallelize across splits (the 100x tier artifact,
  scale_ramp_100x.json, measures the query at ~3-4x per 10x data —
  sub-linear against the flag rule's 15x bound; the r6 prose quoted an
  isolated 2.0x re-measure that contradicted the committed artifact,
  reconciled here to cite the artifact itself).
- Round 4: the tiling proxy itself had two fidelity bugs — the vowel
  rotation repeated every 5 replicas (byte-identical replica pairs
  inflating exact-dup counts) and the embedding nudge left replicas at
  cosine ~1 (inflating the true dup-pair graph ~reps^2). With both fixed
  (injective 25-state translation; per-replica circular dimension shift,
  replica cosine ~0), the dedup/text/similarity families re-measured at
  the 10x tier: every ratio <= ~6x on 10x data except
  `dedup_semantic_clusters`, whose sparse long-chain pair graph then
  exposed min-label propagation's O(diameter) round bound. Fixed with
  pointer jumping in `operators/graph.py` (O(log diameter) rounds):
  321 s -> 21.6 s at the sf1 tier, ratio ~1.1x.
- Remaining >5x-per-10x entries are model fits (MLlib RF/ALS iterations)
  and sub-second plan-compile-bound queries. Exact multi-column distinct
  (`distinct_counts`) left the list in round 6: the single
  multi-count_distinct aggregate Catalyst rewrote into an Expand x4 of
  the lineitem scan is now four per-column two-stage distinct aggregates
  meeting in 1-row scalar joins — isolated best-of-2 re-measure: sf0.1
  0.68 s -> sf1 1.53 s, ratio 2.26x on 10x data (oracle unchanged). The
  100 TB fallback for exact nunique remains the HLL sketch queries.
- R6 checkpoint-width audit (after the fuzzy OOM): every remaining eager
  localCheckpoint site was re-audited for per-row width x grain. All are
  either corpus-x-1 NARROW frames (single/double scalar columns, e.g.
  source_token_stats' 16 B/doc (source, n_tokens), the sketches' 8 B/row
  l_extendedprice slice, grouped_ordered_prefix's post-aggregation grain)
  or bounded-domain aggregates (per-source rows, per-(col,value) counts).
  The fuzzy variant frame was the only corpus-x-K materialization in the
  repo and is gone; a plan gate (no ExistingRDD leaf in the fuzzy plan)
  pins the class shut.
- Round-4 headline recheck: the sweep's two highest ratios
  (`json_extract_props` 13.8x, `q4_order_priority` 8.7x) re-measured in
  isolation at 5.5x and 4.0x on 10x data — dilation-inflated sweep
  numbers, not super-linear plans. The round's grouped-prefix and
  exact-percentile rewrites (`source_quality_gate`,
  `corpus_shuffle_shards`, `pack_sequences_by_source`,
  `grouped_percentiles_totalprice`, `source_token_stats`,
  `decile_customer_acctbal`, `skew_profile_order_custkey`) trade a
  fixed ~1-2 s plan/materialization constant at test scale for plans
  with no per-group reducer sort or value-list buffer at any scale.
- Round 8: (a) pairwise cosine factored — row norms computed once per
  side's projection and carried through the join instead of recomputed
  per candidate pair (bit-identical arithmetic, every oracle hash
  unchanged; the pair stage drops from 3 dot products to 1). Measured:
  the 200k-vector full kNN graph (sum-of-squared-buckets ~312M
  candidates) went from a killed 38+-minute stage to ~185 s in the tier
  sweep, and `dedup_semantic_clusters` at the sf10 tile re-measured
  58.5-66.3 s isolated vs 77.8 s in the r7 artifact. (b) the first r8
  tier sweep read the CC-consuming queries 30-55% above r7
  (semantic 130.8 s) AND the untouched fuzzy probe 41% high — the
  isolated re-measure rule attributed it to a dilation episode spanning
  the sf10 block, not a plan change (semantic isolated: 58.5 s, i.e.
  FASTER than r7); the committed tier table is the clean re-run.
  (c) the 100x kNN probe was replaced: `sim_knn_graph_recall`'s probe
  filter pushes below the top-k window into the self-join (Catalyst
  partition-key pushdown), so that plan only ever computes a 50-anchor
  graph — `sim_knn_graph_adaptive` (full graph, adaptive bits, 4
  rotations, dynamic-bits DuckDB twin) is the honest probe; its
  measured second decade is ~11-12x per 10x data, and the ratio is
  decomposed from the DATA, not argued: the true candidate-pair count
  (sum of squared bucket sizes over all 4 rotations, measured on the
  tiles) is 25,065,718 at sf1 and 313,385,862 at sf10 — exactly 12.50x
  per 10x data, within 0.3% of the uniform-bucket estimate (no skew;
  max bucket 477 vs 390 expected at sf10). The 12.5x constant is the
  ceil() quantization of the adaptive bit width (bits = ceil(log2(
  n/target+1)) jumps 6 -> 9 across this decade; the expected bucket can
  sit up to 2x below target on one tier and near it on the other,
  bounding the per-decade ratio at <= ~12.5x, never compounding). A
  sweep whose sf1 sample lands clean while an sf10 sample lands in a
  dilation episode reads >15x and trips the flag on a plan whose work
  ratio is measured at 12.50x from the bucket histogram itself — hence
  the tier-alternating flag-candidate re-measure.
- Round 9 measurement convention (VERDICT r8 task 3): bench.py now runs
  a fixed-cost HOST-SPEED CANARY (64M generated longs, xxhash64 +
  bit_xor, zero I/O — `bench.run_canary`) at sweep start / between
  sweeps / end, recorded as `canary`/`canary_min` in the BENCH payload
  and side file. Cross-ROUND comparisons must first deflate by the
  canary ratio (r_N.canary_min / r_M.canary_min): BENCH_r08 read
  1.3-1.5x above r7 on every untouched query purely from a dilated host
  window, and best-of-2 + resweeps cannot normalize an episode covering
  the whole run. Quiet-host reference: ~0.19-0.29 s (2026-08,
  local[32]); a canary_min materially above that marks the round's
  artifact as host-inflated.
- Round 9 third-decade bucket-histogram probe (VERDICT r8 task 6,
  `scripts/bucket_probe.py` -> bucket_probe.json): the adaptive-bits
  candidate-pair claim now has TWO measured decades. Candidate pairs
  (sum of squared bucket sizes over all rotations, at the r9 adaptive
  operating points bits/R = 6/8 -> 9/7 -> 12/5): 50,135,516 (20k) ->
  548,421,806 (200k) -> 4,893,040,308 (2M synthetic tier = sf10 tile x
  10 sign-flip replicas, a bucket-space permutation per replica —
  in-memory, never a graph build). Decade ratios: 10.94x then 8.92x per
  10x data — both under the <= ~12.5x ceil() bound and DECREASING, the
  direct evidence the quantization oscillates rather than compounds.
  Max bucket sits 1.16-1.23x above the uniform expectation at every
  tier (312.5/390.6/488.3 expected vs 362/481/586 measured): Poisson
  occupancy, no skew.
"""


SF10_DIR = os.environ.get("SPARK_GRAFT_SCALE100_DIR", "/tmp/spark_graft_scale/sf10")

# The heaviest-shuffle headline queries, probed one more decade out
# (round-5 verdict task 6): does the 10x trend hold at 100x? Round 6
# extends the tier to the document/embedding families (round-6 verdict
# task 1) — the doc-family probes are the three heaviest non-relational
# plans: complete-neighborhood fuzzy linkage, banded-LSH transitive
# groups, and IVF-cell SemDeDup with pointer-jumping closure.
_100X_QUERIES = [
    "q18_large_volume_customers",
    "q5_regional_revenue",
    "median_quantiles",
    "fuzzy_match_customer_names",
    "dedup_minhash_groups",
    "dedup_semantic_clusters",
    # round-6 breadth: one probe per remaining heavy machinery family —
    # agg-based survivorship over dup groups, chunked GK-banded grouped
    # percentiles, and grouped_ordered_prefix (the range-partition +
    # offset-join + partition-local-window shape behind shard export)
    "dedup_survivor_best_quality",
    "grouped_percentiles_totalprice",
    "corpus_shuffle_shards",
    # round-8 (r7 verdict task 2): the round-7/8 operators in their SCALE
    # modes — sim_knn_graph_adaptive IS the full all-points graph with
    # corpus-adaptive bits + 4 rotations (NOT sim_knn_graph_recall, whose
    # probe filter Catalyst pushes below the window, pruning the graph to
    # 50 anchors — a 50-anchor plan probes nothing), mm_image_features is
    # the Arrow mapInPandas media representative, and the new span dedup
    # rides its first second-decade measurement
    "sim_knn_graph_adaptive",
    "mm_image_features",
    "dedup_duplicated_spans",
    # round-9 (r8 verdict tasks 2+5): span->partner attribution rides its
    # first tier row; dedup_span_share probes the windowed+join span
    # COMPOSITION (not just the base op); ml_als_recommend_parts probes
    # the iterative MLlib fit + broadcast-probe serving scan
    "dedup_span_partners",
    "dedup_span_share",
    "ml_als_recommend_parts",
    # the cleaned-corpus emitter: token-grain window + per-doc string
    # reconstruction — the widest-output span query
    "dedup_span_trim",
    # round-9 second batch: BPE merge training (iterative vocab-frame
    # loop — probes that the per-iteration cost tracks the Heaps'-law
    # vocab, not the corpus), aligned-block first-occurrence dedup
    # (groupBy+join on the unit key + per-doc reassembly), and the DSIR
    # log-ratio (two-LM vocab join, the surprisal family's widest probe)
    "text_bpe_merges",
    "dedup_blocks_global",
    "corpus_dsir_logratio",
    # round-9 final trio representative: the leak-free split assignment
    # composes the two heaviest machines (banded LSH pair generation +
    # pointer-jumping CC) with a corpus-wide left join — the composition,
    # not just its parts, gets a second-decade row
    "corpus_split_assign_leakfree",
    # round-10 (r9 verdict tasks 2+3): the keep-one-copy span trim adds
    # a second aggregate (min) to the gram window — same shuffle, probed
    # to confirm; and the all-points multiprobe graph gets its first
    # measured decade via its LINEAR mode (margin-bounded probing,
    # T+1 keys per rotation regardless of the adaptive bit width). The
    # full-flip build (sim_knn_graph_multiprobe, pinned bits) is
    # deliberately NOT the tier row: pinned bits are quadratic across
    # decades by construction, and even at adaptive bits the full flip's
    # (bits+1)x probe volume grows with log N — bounding T IS the fix
    # the r9 verdict asked to measure-or-make
    "dedup_span_trim_keep_one",
    "sim_knn_graph_multiprobe_linear",
    # r10 second batch: the composed IVF-PQ index (residual encode scan
    # + ADC shortlist + exact re-rank) — probes that the coded-corpus
    # encode/scan dominates and stays linear while the driver-side cell
    # math stays constant; and the per-split corpus budget, the round's
    # widest composition (LSH pairs -> CC -> quality -> anchor window ->
    # 3-row agg)
    "sim_ivfpq_topk",
    "corpus_split_budget",
    # r11: the frozen-tokenizer encode (distinct-word-grain fold + vocab
    # anti-join — probes that the encode tracks the Heaps'-law unseen
    # vocabulary, never the corpus), the approximate batched trainer
    # (the production amortization: rounds, not merges, should track the
    # ramp), the dual-grain clustering (the round's widest composition:
    # LSH pairs + SemDeDup pairs -> one CC -> survivor/split/budget +
    # six contract aggregates), and the density-penalized sampler (kNN
    # graph -> density agg -> corpus-wide left join -> top-k)
    "text_bpe_encode_unseen",
    "text_bpe_merges_approx",
    "corpus_split_budget_dual",
    "sample_density_penalized",
    # r11 second batch: the tokenizer-grain pack (train + frozen-rule
    # encode + broadcast map-back + prefix-sum binning — the BPE apply
    # path at record grain), the per-source quota (WindowGroupLimit
    # map-side top-k — the probe checks the limit actually bounds the
    # sort at 100x), and the Heaps'-law growth curve (two corpus scans
    # + a gram-domain min aggregate)
    "text_bpe_pack",
    "corpus_source_quota",
    "text_heaps_ngram_growth",
]
_100X_TABLES = {
    "customer",
    "orders",
    "lineitem",
    "supplier",
    "part",
    "documents",
    "embeddings",
}


_T100_MARKER = "\n## 100x tier: the second decade"
_STREAM_MARKER = "\n## Streaming throughput & state probe"


def _split_sections(txt: str) -> tuple[str, str, str]:
    """Split SCALE.md text into (base, tier100_sec, stream_sec).

    Each owned section is extracted whole and REMOVED from the base
    regardless of the order it appears in, so the two generators here and
    scripts/stream_probe.py compose in any run order (r7, ADVICE r6: the
    old splices assumed stream-always-after-100x; a stream_probe run
    before any 100x section existed got its section duplicated by
    run_tier100 and dropped by main). Writers re-append as
    base + [100x] + [stream], normalizing the order."""

    def _extract(txt: str, marker: str) -> tuple[str, str]:
        if marker not in txt:
            return txt, ""
        i = txt.index(marker)
        ends = [
            j
            for m in (_T100_MARKER, _STREAM_MARKER)
            if (j := txt.find(m, i + 1)) != -1
        ]
        j = min(ends) if ends else len(txt)
        return txt[:i] + txt[j:], txt[i:j]

    txt, t100 = _extract(txt, _T100_MARKER)
    txt, stream = _extract(txt, _STREAM_MARKER)
    return txt, t100, stream


def run_tier100(
    spark: SparkSession,
    base: str,
    skip_gen: bool = False,
    queries: list[str] | None = None,
) -> None:
    """Generate a 100x tile (sf10-equivalent: ~60M lineitem rows, 500k
    documents, 200k embeddings — well under the 128 GiB budget) for the
    tables the probe queries touch and measure the second decade: ratio
    t(sf10)/t(sf1) against 10x data, flagged by the same rule as the
    main ramp (ratio > 1.5x data ratio while materially data-bound).
    Writes scale_ramp_100x.json and appends/replaces the "## 100x tier"
    section of SCALE.md. ``skip_gen`` reuses any already-generated table
    directory (per-table, so adding a probe family regenerates only its
    tables). ``queries`` measures only the named subset and merges its
    rows into the existing scale_ramp_100x.json (other rows carried
    forward unchanged, their provenance visible in the per-row sample
    counts) — the cheap path for adding a new probe family mid-round;
    a full default run re-measures every row like-for-like."""
    names = [n for n in _100X_QUERIES if n in (queries or _100X_QUERIES)]
    generate_scaled(spark, base, SCALED_DIR, 10, reuse=skip_gen)
    t0 = time.time()
    generate_scaled(spark, base, SF10_DIR, 100, tables=_100X_TABLES, reuse=skip_gen)
    print(f"generated {SF10_DIR} in {round(time.time() - t0, 1)}s", file=sys.stderr)
    for n in names:
        _materialize(REGISTRY[n].spark(spark, "/root/testdata/sf0.001"))
    n_sf1: dict[str, int] = {}
    n_sf10: dict[str, int] = {}
    r_sf1 = time_suite(spark, SCALED_DIR, names, counts_out=n_sf1)
    r_sf10 = time_suite(spark, SF10_DIR, names, counts_out=n_sf10)
    repo = os.path.join(os.path.dirname(__file__), "..")
    if queries:
        # carry forward the unmeasured rows from the committed artifact
        prior_path = os.path.join(repo, "scale_ramp_100x.json")
        prior = (
            json.load(open(prior_path))["queries"]
            if os.path.exists(prior_path)
            else {}
        )
        for n in _100X_QUERIES:
            if n in names or n not in prior:
                continue
            r_sf1[n] = prior[n]["sf1"]
            r_sf10[n] = prior[n]["sf10"]
            n_sf1[n] = prior[n].get("samples_sf1", 0)
            n_sf10[n] = prior[n].get("samples_sf10", 0)

    def _flag(t1: float, t10: float) -> tuple[float, bool]:
        ratio = round(t10 / t1, 2) if t1 > 0 else float("inf")
        return ratio, (ratio > 15.0 and t10 > 2.0)

    # Flag-candidate re-measure (r8): the host's dilation episodes only
    # ever INFLATE a sample, so min-of-N converges to the true time as N
    # grows — and a cross-tier ratio built from one lucky sf1 sample and
    # one dilated sf10 sample flags a plan that is provably
    # output-proportional (fuzzy's r7 decomposition). Queries whose
    # first-pass ratio crosses the flag rule get two more dedicated
    # samples per tier (both tiers, so the re-measure cannot bias the
    # ratio's direction) before a SUPER-LINEAR verdict is recorded.
    for n in names:
        _r, fl = _flag(r_sf1[n], r_sf10[n])
        if not fl:
            continue
        # tier-ALTERNATING extra samples: a single contiguous dilation
        # episode then cannot cover every sample of one tier while
        # leaving the other tier's samples clean (which is exactly the
        # mix that manufactures a >15x ratio out of a ~12x plan)
        for sf_dir, store, cnts in (
            (SCALED_DIR, r_sf1, n_sf1),
            (SF10_DIR, r_sf10, n_sf10),
            (SCALED_DIR, r_sf1, n_sf1),
            (SF10_DIR, r_sf10, n_sf10),
            (SCALED_DIR, r_sf1, n_sf1),
            (SF10_DIR, r_sf10, n_sf10),
        ):
            t0 = time.time()
            _materialize(REGISTRY[n].spark(spark, sf_dir))
            store[n] = min(store[n], round(time.time() - t0, 3))
            cnts[n] = cnts.get(n, 0) + 1
            spark.catalog.clearCache()
    rows, flagged = [], []
    for n in _100X_QUERIES:
        if n not in r_sf1:
            continue  # subset run and no prior row to carry forward
        t1, t10 = r_sf1[n], r_sf10[n]
        ratio, fl = _flag(t1, t10)
        if fl:
            flagged.append(n)
        rows.append((n, t1, t10, ratio, fl, n_sf1.get(n, 0), n_sf10.get(n, 0)))
    with open(os.path.join(repo, "scale_ramp_100x.json"), "w") as f:
        json.dump(
            {
                "queries": {
                    n: {
                        "sf1": t1,
                        "sf10": t10,
                        "ratio": ratio,
                        # per-tier sample counts behind each min (ADVICE
                        # r8: a re-measured min-of-7 row is not
                        # like-for-like with a min-of-2 row; mark it)
                        "samples_sf1": c1,
                        "samples_sf10": c10,
                    }
                    for n, t1, t10, ratio, _fl, c1, c10 in rows
                },
                "flagged": flagged,
            },
            f,
            indent=1,
        )
    sec = [
        "",
        "## 100x tier: the second decade (rounds 5-8)",
        "",
        "sf10 tier = sf0.1 tiled x100. Round 6 extends the tier from the",
        "three heaviest relational probes to the document/embedding",
        "families (fuzzy linkage, MinHash-LSH transitive groups, SemDeDup)",
        "after a tiling-fidelity fix: customer names now get a per-replica",
        "6-char alternating disjoint-alphabet suffix code (pairwise EDIT",
        "distance >= 3 and LCS <= 3 between replica codes — Hamming-3",
        "codes like Reed-Solomon [4,2,3] fail via shift pairs at",
        "Levenshtein 2; see _name_suffix), so fuzzy's dedupe-first grain",
        "genuinely scales with reps instead of collapsing to the base",
        "corpus; the document",
        "translation budget grew to 100 (20-consonant rotation) and the",
        "embedding permutation family to 2*dim=128 (dihedral: rotations +",
        "reflections). A second round-6 pass added one probe per",
        "remaining heavy machinery family: agg-based survivorship,",
        "chunked GK-banded grouped percentiles, and grouped_ordered_prefix",
        "(range-partition + offset-join + partition-local windows — the",
        "shard-export shape). Round 7: tiles are regenerated under the",
        "scheme-version stamp (stale/partial tiles can no longer be",
        "silently reused), fuzzy pair emission is the two-stage explode",
        "(O(group) per-row arrays, see operators/joins.py), and the CC",
        "closure sizes its per-round shuffles from the edge count.",
        "Round 8: three probes for the newest operators in their SCALE",
        "modes — the FULL all-points kNN graph with corpus-adaptive",
        "bucket bits and 4 sign-plane rotations (sim_knn_graph_adaptive;",
        "the recall query is NOT the probe — its anchor filter pushes",
        "below the top-k window and prunes the graph to 50 probes), the",
        "Arrow-batched multimodal featurizer, and the span-level dedup",
        "(gram-keyed count window + per-doc islands). Round 9: the",
        "span->partner attribution (join-free bounded-exemplar window),",
        "the span-share composition, and the ALS fit+serve plan get tier",
        "rows (r8 verdict tasks 2+5), and sim_knn_graph_adaptive now runs",
        "ADAPTIVE rotations (R = min(8, dim//bits): 8 at the sf1 tile's",
        "6-bit width, 7 at the sf10 tile's 9-bit width — ~2x the r8 R=4",
        "candidate volume, recall 0.69-0.79 vs ~0.45). A second round-9",
        "batch probes the session's new operators: BPE merge training",
        "(the iterative loop must track the Heaps'-law VOCAB, not the",
        "corpus — a super-linear row here would mean the iteration frame",
        "is corpus-sized), aligned-block first-occurrence dedup, and the",
        "DSIR two-LM log-ratio. Round 10: the keep-one-copy span trim",
        "(keeper election is a second aggregate on the same gram window —",
        "measured 2.62x, inside the trim-all row's 3.62x) and the",
        "multiprobe kNN graph via its LINEAR mode (margin-bounded",
        "probing, T+1 = 3 keys per rotation regardless of the adaptive",
        "bit width): measured 10.82x vs an expected 12.5x from pure",
        "bucket-size quantization (bits 6 -> 9 across the decade leaves",
        "expected bucket size 312 -> 390, x10 data = 12.5x candidates;",
        "the probe factor contributes exactly 1 by construction) — the",
        "same bounded ceil() regime as the adaptive row's 11.24x, now",
        "measured for the multiprobe build too (r9 verdict task 3). The",
        "FULL-flip multiprobe build is deliberately not tier-probed:",
        "pinned bits are quadratic across decades by construction, and",
        "its adaptive-bits probe volume grows with log N — bounding T is",
        "the fix, and the linear row above is its measurement. DSIR",
        "re-measured after the r10 (doc, word, cnt) pre-aggregation of",
        "the vocab join's probe side: 9.82x -> 1.80x per decade (sf10",
        "25.9 s -> 5.5 s) — the shuffle had been carrying the within-doc",
        "token repeat factor (r9 verdict task 4). The r10 second batch",
        "adds the composed IVF-PQ index (residual encode scan + ADC",
        "shortlist + exact re-rank): 2.18x per decade — the seeded",
        "KMeans fit and driver-side codebook/table math are constant, so",
        "the decade cost is the linear coded-corpus scan. The per-split",
        "corpus budget — the round's widest composition (LSH pairs -> CC",
        "-> quality -> anchor window -> 3-row agg) — measures 7.3x per",
        "decade, consistent with its two component rows (split assignment",
        "5.37x, survivorship 5.34x) plus the added quality/window stages.",
        "Ratio = t(sf10)/t(sf1) against 10x data — the same",
        "flag rule as above, applied one decade further out to confirm",
        "the 10x trend is a trend and not a plateau artifact. Flag",
        "candidates get three extra dedicated samples per tier (min-of-N;",
        "dilation only ever inflates, and the re-measure covers BOTH",
        "tiers so it cannot bias the ratio's direction) before a",
        "SUPER-LINEAR verdict is recorded (r8). The samples column marks",
        "how many samples each tier's min came from (r9, ADVICE r8): rows",
        "whose counts exceed 2-3 were flag-candidate re-measured and are",
        "min-of-N, not like-for-like with single-resweep rows.",
        "",
        "| query | sf1 s | sf10 s | ratio (10x data) | samples (sf1/sf10) | flag |",
        "|---|---|---|---|---|---|",
    ]
    for n, t1, t10, ratio, fl, c1, c10 in rows:
        sec.append(
            f"| {n} | {t1} | {t10} | {ratio} | {c1}/{c10} | "
            f"{'**SUPER-LINEAR**' if fl else ''} |"
        )
    sec.append("")
    sec.append(f"Flagged super-linear at the 100x tier: {flagged or 'none'}.")
    sec.append("")
    scale_md = os.path.join(repo, "SCALE.md")
    txt = open(scale_md).read() if os.path.exists(scale_md) else ""
    # replace the 100x section this writer owns, preserve the streaming
    # section (scripts/stream_probe.py owns it) wherever it was
    base_txt, _old_t100, stream_sec = _split_sections(txt)
    with open(scale_md, "w") as f:
        f.write(base_txt + "\n".join(sec) + stream_sec)
    print(json.dumps({"tier100_flagged": flagged, "rows": rows}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--tier100", action="store_true")
    args = ap.parse_args()

    spark = get_spark("scale_ramp")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    if args.tier100:
        run_tier100(spark, base, skip_gen=args.skip_gen, queries=args.queries)
        spark.stop()
        return
    if not args.skip_gen or not os.path.isdir(SCALED_DIR):
        t0 = time.time()
        generate_scaled(spark, base, SCALED_DIR, args.reps)
        print(f"generated {SCALED_DIR} in {round(time.time() - t0, 1)}s", file=sys.stderr)

    names = args.queries or [n for n in HEADLINE if n in REGISTRY]
    # warm-up outside the timed region
    for n in names[:3]:
        _materialize(REGISTRY[n].spark(spark, "/root/testdata/sf0.001"))

    tiers = {
        "sf0.01": "/root/testdata/sf0.01",
        "sf0.1": base,
        "sf1": SCALED_DIR,
    }
    results = {tier: time_suite(spark, d, names) for tier, d in tiers.items()}

    data_ratio = float(args.reps)
    rows, flagged = [], []
    for n in names:
        t_small, t_big = results["sf0.1"][n], results["sf1"][n]
        ratio = round(t_big / t_small, 2) if t_small > 0 else float("inf")
        # constant plan/compile overhead dominates sub-second queries;
        # only flag when the big tier is materially data-bound
        is_flagged = ratio > 1.5 * data_ratio and t_big > 2.0
        if is_flagged:
            flagged.append(n)
        rows.append((n, results["sf0.01"][n], t_small, t_big, ratio, is_flagged))

    md = [
        "# SCALE — headline-suite runtime vs data size",
        "",
        f"sf1 tier = sf0.1 tiled x{args.reps} with per-replica key-domain",
        "offsets (see `scripts/scale_ramp.py` for why tiling is a fair",
        "scaling proxy). Ratio = t(sf1)/t(sf0.1) against a "
        f"{data_ratio:.0f}x data ratio;",
        f"flagged when ratio > {1.5 * data_ratio:.0f} and t(sf1) > 2 s",
        "(sub-second queries are plan-compile-bound, ratio ~1 expected).",
        "",
        "| query | sf0.01 s | sf0.1 s | sf1 s | ratio | flag |",
        "|---|---|---|---|---|---|",
    ]
    for n, t001, t01, t1, ratio, fl in rows:
        md.append(
            f"| {n} | {t001} | {t01} | {t1} | {ratio} | "
            f"{'**SUPER-LINEAR**' if fl else ''} |"
        )
    tot = {t: round(sum(r.values()), 1) for t, r in results.items()}
    md += [
        "",
        f"Totals: sf0.01 {tot['sf0.01']} s, sf0.1 {tot['sf0.1']} s, "
        f"sf1 {tot['sf1']} s "
        f"(suite ratio {round(tot['sf1'] / tot['sf0.1'], 2)}x on "
        f"{data_ratio:.0f}x data).",
        f"Flagged super-linear: {flagged or 'none'}.",
        "",
    ]
    repo = os.path.join(os.path.dirname(__file__), "..")
    # preserve the 100x-tier section (run_tier100's) AND the streaming
    # section (stream_probe.py's) so the three writers compose in any
    # run order instead of clobbering each other
    scale_md = os.path.join(repo, "SCALE.md")
    tier100_sec, stream_sec = "", ""
    if os.path.exists(scale_md):
        _base, tier100_sec, stream_sec = _split_sections(open(scale_md).read())
    with open(scale_md, "w") as f:
        f.write("\n".join(md))
        f.write(AUDIT_APPENDIX)
        f.write(tier100_sec)
        f.write(stream_sec)
    with open(os.path.join(repo, "scale_ramp.json"), "w") as f:
        json.dump(
            {
                "reps": args.reps,
                "tiers": results,
                "flagged": flagged,
                "totals": tot,
            },
            f,
            indent=1,
        )
    print(json.dumps({"flagged": flagged, "totals": tot}))
    spark.stop()


if __name__ == "__main__":
    main()
