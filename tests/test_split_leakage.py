"""Split-leakage guard + leak-free assignment (queries_dedup.py r9)."""

import hashlib
import os

from data_pipeline_agent_spark.plans.registry import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _split_of(doc_id: int) -> str:
    b = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
    return "test" if b < "14" else ("val" if b < "28" else "train")


def test_assignment_is_leakfree_at_default_sf(spark):
    """THE invariant: under the repaired assignment no verified near-dup
    pair straddles splits (the detector query may legitimately show
    leaked pairs under the naive per-doc split; the repair must show
    zero)."""
    from pyspark.sql import functions as F

    assign = REGISTRY["corpus_split_assign_leakfree"].spark(spark, SF_DIR)
    pairs = REGISTRY["dedup_minhash_lsh"].spark(spark, SF_DIR)
    a = assign.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = assign.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    leaked = (
        pairs.join(a, "id_a").join(b, "id_b")
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaked == 0


def test_singletons_keep_their_own_split(spark):
    """Docs with no near-dup anchor themselves: split identical to the
    naive per-doc hash split used by corpus_split_leakage."""
    rows = (
        REGISTRY["corpus_split_assign_leakfree"]
        .spark(spark, SF_DIR)
        .where("NOT moved_with_cluster")
        .collect()
    )
    assert rows, "expected singleton docs"
    # every singleton, not a prefix slice (ADVICE r9): the sf0.001 frame
    # is small enough to check all rows, and a split-hash drift that
    # only hits later rows must not pass
    for r in rows:
        assert r["split"] == _split_of(r["doc_id"])


def test_split_survivor_composition_invariants(spark):
    """r10 (r9 verdict task 5): the composed corpus_split_survivor query
    must agree with corpus_split_assign_leakfree — every cluster's
    survivor AND members land in the cluster's one split — and the
    survivor must be a member of its own cluster."""
    from pyspark.sql import functions as F

    comp = REGISTRY["corpus_split_survivor"].spark(spark, SF_DIR)
    assign = REGISTRY["corpus_split_assign_leakfree"].spark(spark, SF_DIR)
    assert comp.count() > 0, "corpus should contain duplicate clusters"
    # member splits == the composed cluster split (survivor included:
    # it is one of the members)
    j = assign.join(
        comp.select(
            F.col("group_id").alias("anchor_id"),
            F.col("split").alias("cluster_split"),
        ),
        "anchor_id",
    )
    assert j.where(F.col("split") != F.col("cluster_split")).count() == 0
    # survivor is a member of the cluster it represents
    memb = assign.select(
        F.col("doc_id").alias("survivor_doc_id"),
        F.col("anchor_id").alias("group_id"),
    )
    assert comp.join(memb, ["survivor_doc_id", "group_id"], "left_anti").count() == 0
    # and the split is a pure function of the anchor hash
    for r in comp.collect():
        assert r["split"] == _split_of(r["group_id"])


def test_cluster_members_share_anchor_split(spark):
    rows = (
        REGISTRY["corpus_split_assign_leakfree"]
        .spark(spark, SF_DIR)
        .where("moved_with_cluster")
        .collect()
    )
    assert rows, "corpus should contain near-dup clusters"
    for r in rows:
        assert r["split"] == _split_of(r["anchor_id"])
        assert r["anchor_id"] < r["doc_id"]  # anchor is the min member
