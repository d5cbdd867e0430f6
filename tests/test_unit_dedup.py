"""C4/CCNet unit-dedup family: line and aligned-block first-occurrence
dedup with document reassembly (operators/dedup.py).

The oracle artifact hash-checks dedup_blocks_global end to end; the LINE
variant cannot fire on the synthetic corpus (no newlines), so its
semantics are pinned here on newline-structured fixtures.
"""

from pyspark.sql import functions as F

from data_pipeline_agent_spark.operators.dedup import (
    dedup_blocks,
    dedup_lines,
)

LONG = "alpha beta gamma delta epsilon zeta"  # 6 tokens >= gate
SHORT = "tiny line"  # 2 tokens < gate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_keeps_first_occurrence_only(spark):
    docs = _docs(
        spark,
        [
            (1, f"{LONG}\nunique one two three four five\n{SHORT}"),
            (2, f"{SHORT}\n{LONG}"),
            (3, LONG),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    # doc 1 is the global first occurrence of LONG -> keeps everything
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == (
        f"{LONG}\nunique one two three four five\n{SHORT}"
    )
    # docs 2 and 3 lose their LONG copy; short lines always survive
    assert out[2]["n_removed"] == 1 and out[2]["clean_text"] == SHORT
    assert out[3]["n_removed"] == 1 and out[3]["clean_text"] == ""
    assert [out[i]["n_lines"] for i in (1, 2, 3)] == [3, 2, 1]


def test_line_dedup_within_doc_repeat(spark):
    docs = _docs(spark, [(7, f"{LONG}\n{LONG}\n{LONG}")])
    row = dedup_lines(docs).first()
    # first position survives, the two later in-doc repeats are removed
    assert row["n_lines"] == 3 and row["n_removed"] == 2
    assert row["clean_text"] == LONG


def test_line_dedup_first_is_min_doc_then_pos(spark):
    docs = _docs(
        spark,
        [(5, f"{SHORT}\n{LONG}"), (4, f"padding pad pad pad pad pad\n{LONG}")],
    )
    out = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    # (4, pos 2) < (5, pos 2): doc 4 keeps LONG, doc 5 loses it
    assert out[4]["n_removed"] == 0
    assert out[5]["n_removed"] == 1


def test_block_dedup_aligned_units(spark):
    w8 = "a b c d e f g h"  # exactly one 8-token block
    docs = _docs(
        spark,
        [
            (1, f"{w8} {w8}"),  # two identical aligned blocks in one doc
            (2, f"{w8} tail only"),  # block repeat + a 2-token tail block
        ],
    )
    out = {r["doc_id"]: r for r in dedup_blocks(docs).collect()}
    # doc 1: block 1 kept, block 2 (same text, later pos) removed
    assert out[1]["n_lines"] == 2 and out[1]["n_removed"] == 1
    assert out[1]["clean_text"] == w8
    # doc 2: its w8 block is a later global occurrence -> removed;
    # the short tail block never participates
    assert out[2]["n_removed"] == 1
    assert out[2]["clean_text"] == "tail only"


def test_block_dedup_empty_token_stream_no_phantom_blocks(spark):
    # sequence(1, 0) reverses in Spark — the guard must emit NO units
    docs = _docs(spark, [(1, "   "), (2, LONG)])
    rows = {r["doc_id"]: r for r in dedup_blocks(docs).collect()}
    assert 1 not in rows  # no units -> doc drops out (matches the twin)
    assert rows[2]["n_removed"] == 0


def test_block_dedup_plan_no_cartesian(spark):
    docs = _docs(spark, [(1, LONG)])
    plan = dedup_blocks(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
