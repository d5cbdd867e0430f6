"""duplicated_spans unit tests (operators/dedup.py, r8): handcrafted
corpora pin the semantics the sf-corpus oracle check can't isolate —
cross-doc vs within-doc repeats, island merging of overlapping/adjacent
anchors, the n-token detection floor, and sub-n documents."""

from pyspark.sql import functions as F

from data_pipeline_agent_spark.operators.dedup import duplicated_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(spark, rows, **kw):
    out = duplicated_spans(_docs(spark, rows), **kw).collect()
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_grams) for r in out
    )


W = " ".join  # token helper


def test_cross_doc_duplicated_run_detected_exactly(spark):
    # 10 shared tokens inside distinct docs -> one span of 10 in each,
    # at the right offsets (doc 1: positions 3-12; doc 2: positions 1-10)
    shared = [f"s{i}" for i in range(10)]
    rows = [
        (1, W(["a1", "a2"] + shared + ["a3"])),
        (2, W(shared + ["b1", "b2", "b3"])),
    ]
    got = _spans(spark, rows, n=8)
    assert got == [(1, 3, 12, 10, 3), (2, 1, 10, 10, 3)]


def test_run_shorter_than_n_not_detected(spark):
    # 7 shared tokens < n=8 -> no duplicated 8-gram exists -> no spans
    shared = [f"s{i}" for i in range(7)]
    rows = [
        (1, W(shared + [f"a{i}" for i in range(8)])),
        (2, W(shared + [f"b{i}" for i in range(8)])),
    ]
    assert _spans(spark, rows, n=8) == []


def test_within_doc_repeat_counts_as_duplicated(spark):
    # the same 8 tokens twice INSIDE one doc (Lee et al. count any
    # corpus repeat): both occurrences marked, separated by > n gap
    run = [f"r{i}" for i in range(8)]
    gap = [f"g{i}" for i in range(12)]
    rows = [(1, W(run + gap + run))]
    got = _spans(spark, rows, n=8)
    assert got == [(1, 1, 8, 8, 1), (1, 21, 28, 8, 1)]


def test_adjacent_anchors_merge_into_one_maximal_span(spark):
    # a 20-token shared run -> 13 overlapping 8-gram anchors -> ONE
    # maximal span covering all 20 tokens, not 13 fragments
    shared = [f"s{i}" for i in range(20)]
    rows = [(1, W(shared)), (2, W(shared))]
    got = _spans(spark, rows, n=8)
    assert got == [(1, 1, 20, 20, 13), (2, 1, 20, 20, 13)]


def test_docs_below_n_tokens_emit_nothing(spark):
    rows = [(1, "a b c"), (2, "a b c")]
    assert _spans(spark, rows, n=8) == []


def test_span_plan_has_no_cartesian_and_no_pair_emission(spark):
    """Plan gate (verdict task 4): never a cross join, and the gram stage
    must stay O(group) — a count window over the gram key, not a
    gram-keyed self-join emitting occurrence pairs."""
    from data_pipeline_agent_spark.plans import REGISTRY
    from tests.conftest import SF_DIR

    df = REGISTRY["dedup_duplicated_spans"].spark(spark, SF_DIR)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    # exactly one generator (the positional posexplode); a second explode
    # would signal a pair/variant materialization creeping in. Count the
    # formatted-plan NODE HEADERS ("(<id>) Generate") rather than raw
    # substring occurrences — the detail-line count is a formatting
    # implementation detail that shifts across Spark versions (ADVICE r8)
    import re

    assert len(re.findall(r"\(\d+\) Generate\b", txt)) == 1


def _partners(spark, rows, **kw):
    from data_pipeline_agent_spark.operators.dedup import span_partners

    out = span_partners(_docs(spark, rows), **kw).collect()
    return sorted((r.doc_id, r.partner_id, r.shared_grams, r.rk) for r in out)


def test_span_partners_exemplar_cap_and_keep_first_direction(spark):
    # one 8-token run shared by 5 docs; exemplars = 3 lowest doc_ids.
    # Every doc attributes to exemplars {1,2,3} minus itself; docs 4,5
    # (past the cap) are never listed as partners — the keep-first canon:
    # trimmed docs point at the copies that would be KEPT.
    run = [f"s{i}" for i in range(8)]
    rows = [(d, W(run + [f"u{d}_{i}" for i in range(3)])) for d in (1, 2, 3, 4, 5)]
    got = _partners(spark, rows, n=8)
    want = sorted(
        [
            (1, 2, 1, 1), (1, 3, 1, 2),
            (2, 1, 1, 1), (2, 3, 1, 2),
            (3, 1, 1, 1), (3, 2, 1, 2),
            (4, 1, 1, 1), (4, 2, 1, 2), (4, 3, 1, 3),
            (5, 1, 1, 1), (5, 2, 1, 2), (5, 3, 1, 3),
        ]
    )
    assert got == want


def test_span_partners_within_doc_repeat_has_no_partner(spark):
    # a gram duplicated only INSIDE one doc marks spans (Lee et al.) but
    # attributes no partner — there is no other doc to keep a copy of
    run = [f"r{i}" for i in range(8)]
    gap = [f"g{i}" for i in range(12)]
    rows = [(1, W(run + gap + run))]
    assert _partners(spark, rows, n=8) == []


def test_span_partners_counts_shared_grams_and_ranks(spark):
    # doc 3 shares a 20-token run with doc 1 (13 overlapping 8-grams) and
    # a disjoint 8-token run with doc 2 (1 gram): partner 1 ranks first
    long_run = [f"a{i}" for i in range(20)]
    short_run = [f"b{i}" for i in range(8)]
    rows = [
        (1, W(long_run)),
        (2, W(short_run)),
        (3, W(long_run + ["x1", "x2"] + short_run)),
    ]
    got = _partners(spark, rows, n=8)
    assert (3, 1, 13, 1) in got
    assert (3, 2, 1, 2) in got
    # symmetric low-id sides
    assert (1, 3, 13, 1) in got
    assert (2, 3, 1, 1) in got


def test_span_partners_plan_group_bounded(spark):
    """Plan gate: NO JOIN of any kind (the attribution comes from a
    bounded collect_list window + explode, never a gram self-join that
    would re-scan the corpus per side), no cartesian, and exactly two
    generators — the positional posexplode plus the <= 3-wide exemplar
    explode."""
    import re

    from data_pipeline_agent_spark.plans import REGISTRY
    from tests.conftest import SF_DIR

    df = REGISTRY["dedup_span_partners"].spark(spark, SF_DIR)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in txt
    assert "Join" not in txt  # no join operator of ANY kind
    assert len(re.findall(r"\(\d+\) Generate\b", txt)) == 2
    # exactly one parquet scan: the whole attribution is one corpus pass
    assert len(re.findall(r"\(\d+\) Scan parquet\b", txt)) == 1


def _trim(spark, rows, **kw):
    from data_pipeline_agent_spark.operators.dedup import span_trimmed_text

    out = span_trimmed_text(_docs(spark, rows), **kw).collect()
    return {r.doc_id: (r.n_tokens, r.kept_tokens, r.trimmed_text) for r in out}


def test_span_trim_removes_duplicated_region_preserves_order(spark):
    # doc 1: [a1 a2] + 10 shared + [a3]; the shared run trims out, the
    # unique tokens survive in original order
    shared = [f"s{i}" for i in range(10)]
    rows = [
        (1, W(["a1", "a2"] + shared + ["a3"])),
        (2, W(shared + ["b1", "b2", "b3"])),
    ]
    got = _trim(spark, rows, n=8)
    assert got[1] == (13, 3, "a1 a2 a3")
    assert got[2] == (13, 3, "b1 b2 b3")


def test_span_trim_fully_duplicated_doc_trims_to_empty(spark):
    run = [f"s{i}" for i in range(8)]
    rows = [(1, W(run)), (2, W(run))]
    got = _trim(spark, rows, n=8)
    assert got[1] == (8, 0, "")
    assert got[2] == (8, 0, "")


def test_span_trim_no_duplication_keeps_everything(spark):
    rows = [(1, W([f"a{i}" for i in range(12)])), (2, W([f"b{i}" for i in range(12)]))]
    got = _trim(spark, rows, n=8)
    assert got[1] == (12, 12, W([f"a{i}" for i in range(12)]))
    assert got[2] == (12, 12, W([f"b{i}" for i in range(12)]))


def test_span_trim_consistent_with_duplicated_spans(spark):
    """Cross-operator identity: the islands of duplicated_spans are
    exactly the maximal covered runs, so per doc kept_tokens must equal
    n_tokens - sum(span_tokens) on the real corpus."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.operators.dedup import (
        duplicated_spans,
        span_trimmed_text,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    spans = duplicated_spans(docs)
    per_doc = spans.groupBy("doc_id").agg(F.sum("span_tokens").alias("dup"))
    trim = span_trimmed_text(docs)
    bad = (
        trim.join(per_doc, "doc_id", "left")
        .where(
            F.col("kept_tokens")
            != F.col("n_tokens") - F.coalesce(F.col("dup"), F.lit(0))
        )
        .count()
    )
    assert bad == 0


def _trim_keep_one(spark, rows, **kw):
    from data_pipeline_agent_spark.operators.dedup import span_trimmed_text

    out = span_trimmed_text(_docs(spark, rows), keep_one=True, **kw).collect()
    return {r.doc_id: (r.n_tokens, r.kept_tokens, r.trimmed_text) for r in out}


def test_span_trim_keep_one_keeper_retains_trailing_copies_trim(spark):
    # the min-id participant of the shared run KEEPS it (Lee et al.
    # keep-one-copy); only the trailing copy trims
    shared = [f"s{i}" for i in range(10)]
    rows = [
        (1, W(["a1", "a2"] + shared + ["a3"])),
        (2, W(shared + ["b1", "b2", "b3"])),
    ]
    got = _trim_keep_one(spark, rows, n=8)
    assert got[1] == (13, 13, W(["a1", "a2"] + shared + ["a3"]))
    assert got[2] == (13, 3, "b1 b2 b3")


def test_span_trim_keep_one_mixed_keeper_roles(spark):
    # doc 2 is the TRAILING copy of run A (keeper: doc 1) but the KEEPER
    # of run B (shared with doc 3): it trims A and retains B
    run_a = [f"a{i}" for i in range(8)]
    run_b = [f"b{i}" for i in range(8)]
    rows = [
        (1, W(run_a + ["u1"])),
        (2, W(run_a + ["u2"] + run_b)),
        (3, W(run_b + ["u3"])),
    ]
    got = _trim_keep_one(spark, rows, n=8)
    assert got[1] == (9, 9, W(run_a + ["u1"]))
    assert got[2] == (17, 9, W(["u2"] + run_b))
    assert got[3] == (9, 1, "u3")


def test_span_trim_keep_one_within_doc_repeat_fully_kept(spark):
    # keeper election is per gram at DOC grain: a within-doc-only
    # duplicate's doc is its own keeper, so both copies stay (documented
    # scope choice — keep_one=False is the intra-doc boilerplate tool)
    run = [f"r{i}" for i in range(8)]
    gap = [f"g{i}" for i in range(12)]
    rows = [(1, W(run + gap + run))]
    got = _trim_keep_one(spark, rows, n=8)
    assert got[1] == (28, 28, W(run + gap + run))


def test_span_trim_keep_one_identities_on_corpus(spark):
    """Cross-operator identities on the real corpus (r9 verdict task 2's
    'done' bar): (a) a doc that anchors (is min-id keeper of) EVERY
    duplicated gram it contains keeps all its tokens; (b) keep-one never
    trims more than trim-all: kept_keep_one >= kept_all per doc, equal
    n_tokens totals."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.operators.dedup import (
        SPAN_GRAM_N,
        _gram_occurrences,
        span_trimmed_text,
    )
    from pyspark.sql import Window
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wg = Window.partitionBy("__gram")
    occ = (
        _gram_occurrences(docs, SPAN_GRAM_N, "text", "doc_id")
        .withColumn("__cnt", F.count(F.lit(1)).over(wg))
        .withColumn("__keeper", F.min("doc_id").over(wg))
        .where(F.col("__cnt") >= 2)
    )
    # docs with >= 1 duplicated gram, all of which they anchor
    all_anchor = (
        occ.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("doc_id") != F.col("__keeper"), 1).otherwise(0)
            ).alias("foreign")
        )
        .where(F.col("foreign") == 0)
        .select("doc_id")
    )
    keep1 = span_trimmed_text(docs, keep_one=True).alias("k1")
    # (a) pure keepers lose nothing
    bad_keeper = (
        keep1.join(all_anchor, "doc_id")
        .where(F.col("kept_tokens") != F.col("n_tokens"))
        .count()
    )
    assert bad_keeper == 0
    # (b) keep-one dominates trim-all
    alltrim = span_trimmed_text(docs).select(
        "doc_id",
        F.col("n_tokens").alias("nt_all"),
        F.col("kept_tokens").alias("kept_all"),
    )
    joined = keep1.join(alltrim, "doc_id")
    assert joined.where(F.col("n_tokens") != F.col("nt_all")).count() == 0
    assert joined.where(F.col("kept_tokens") < F.col("kept_all")).count() == 0
    # and the corpus genuinely exercises both modes differing
    assert joined.where(F.col("kept_tokens") > F.col("kept_all")).count() > 0


def test_span_trim_keep_one_plan_no_join(spark):
    """Plan gate: keeper election rides the gram window's exchange —
    still zero Join nodes, two generators, like dedup_span_trim."""
    import re

    from data_pipeline_agent_spark.plans import REGISTRY
    from tests.conftest import SF_DIR

    df = REGISTRY["dedup_span_trim_keep_one"].spark(spark, SF_DIR)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in txt
    assert "Join" not in txt
    assert len(re.findall(r"\(\d+\) Generate\b", txt)) == 2


def test_span_trim_plan_no_join_one_window_pass(spark):
    """Plan gate: the trim plan must carry anchors into the token stream
    by UNION (rides the per-doc window's shuffle), never a (doc, pos)
    equi-join or a range join — zero Join nodes; two generators (gram
    posexplode + token posexplode)."""
    import re

    from data_pipeline_agent_spark.plans import REGISTRY
    from tests.conftest import SF_DIR

    df = REGISTRY["dedup_span_trim"].spark(spark, SF_DIR)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in txt
    assert "Join" not in txt
    assert len(re.findall(r"\(\d+\) Generate\b", txt)) == 2
