"""BPE merge training: greedy scan semantics + determinism.

The oracle artifact hash-checks the full pipeline against DuckDB; these
tests pin the merge-application edge cases the hash could only catch
indirectly (overlapping runs, multi-char cascades, tie-breaks).
"""

from pyspark.sql import functions as F

from data_pipeline_agent_spark.operators.bpe import (
    _apply_merge,
    bpe_train,
    word_freq,
)


def _merge_one(spark, syms: list[str], lhs: str, rhs: str) -> list[str]:
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    return df.select(_apply_merge(F.col("syms"), lhs, rhs).alias("m")).first()["m"]


def test_merge_overlapping_run_every_other(spark):
    # subword-nmt greedy scan: "aaaa" under (a,a) -> [aa, aa]; "aaa" -> [aa, a]
    assert _merge_one(spark, list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _merge_one(spark, list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_one(spark, list("aaaaa"), "a", "a") == ["aa", "aa", "a"]


def test_merge_no_immediate_remerge(spark):
    # after merging (a,b) the new symbol "ab" must not re-match as lhs=a
    assert _merge_one(spark, list("abab"), "a", "b") == ["ab", "ab"]
    # multi-char lhs from an earlier merge participates like any symbol
    assert _merge_one(spark, ["ab", "b", "b"], "ab", "b") == ["abb", "b"]


def test_merge_noop_and_single(spark):
    assert _merge_one(spark, list("xyz"), "a", "b") == ["x", "y", "z"]
    assert _merge_one(spark, ["q"], "a", "b") == ["q"]


def test_word_freq_ascii_gate(spark):
    docs = spark.createDataFrame(
        [(1, "Foo foo BAR7 éé foo-bar"), (2, "bar7 foo")],
        "doc_id long, text string",
    )
    rows = {r["word"]: r["freq"] for r in word_freq(docs).collect()}
    # lowercased; "éé" and "foo-bar" fail the ASCII-alnum gate
    assert rows == {"foo": 3, "bar7": 2}


def test_bpe_train_deterministic_ranks_and_tiebreak(spark):
    # freq-weighted: "abab" x3 -> (a,b)=6, (b,a)=3; "cd" x5 -> (c,d)=5.
    # rank1 = (a,b) cnt 6; after merging, (ab,ab)=3 ties (c,d)=5? no: 5>3,
    # rank2 = (c,d) 5; rank3 = (ab,ab) 3 vs (b,a)? (b,a) pairs vanished
    # inside "abab" after merge. Tie-break check: "xy" x3 vs "xz"? use
    # equal counts -> lexicographic (l, r) wins.
    docs = spark.createDataFrame(
        [(1, "abab abab abab cd cd cd cd cd xy xy xw xw")],
        "doc_id long, text string",
    )
    out = bpe_train(docs, n_merges=4).collect()
    got = [(r["merge_rank"], r["lhs"], r["rhs"], r["cnt"]) for r in out]
    assert got[0] == (1, "a", "b", 6)
    assert got[1] == (2, "c", "d", 5)
    assert got[2] == (3, "ab", "ab", 3)
    # (x,w)=2 and (x,y)=2 tie -> lexicographic: (x,w) before (x,y)
    assert got[3] == (4, "x", "w", 2)


def test_bpe_train_stops_when_no_pairs(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = bpe_train(docs, n_merges=5).collect()
    assert out == []


def test_bpe_fertility_counts(spark):
    from data_pipeline_agent_spark.operators.bpe import bpe_fertility

    # corpus: "abab" x3, "cd" x2 -> merges (a,b) then (c,d) then (ab,ab)
    docs = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd X!")],  # X! fails the gate
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_fertility(docs, n_merges=3).collect()}
    # after 3 merges: "abab" -> [abab] (1 subtoken), "cd" -> [cd] (1)
    assert out[1]["n_words"] == 3 and out[1]["n_subtokens"] == 3
    assert out[2]["n_words"] == 2 and out[2]["n_subtokens"] == 2
    assert out[1]["fertility"] == 1.0


def test_bpe_fertility_partial_merges(spark):
    from data_pipeline_agent_spark.operators.bpe import bpe_fertility

    docs = spark.createDataFrame(
        [(1, "abab abab abab xyz")], "doc_id long, text string"
    )
    out = bpe_fertility(docs, n_merges=1).first()
    # one merge (a,b): "abab" -> [ab, ab] = 2 subtokens; "xyz" -> 3 chars
    assert out["n_words"] == 4 and out["n_subtokens"] == 3 * 2 + 3
    assert out["fertility"] == round(9 / 4, 6)


def test_bpe_oracle_exhaustion_parity(spark):
    """When the pair supply exhausts before n_merges, Spark breaks and
    KEEPS the final vocab; the DuckDB chain must pass the vocab through
    empty-m iterations instead of zeroing it (r9 self-review finding:
    a cross join against the empty m{k} made v{k} empty and the
    fertility twin returned 0 rows)."""
    import duckdb
    import pandas as pd

    from data_pipeline_agent_spark.operators.bpe import bpe_fertility
    from data_pipeline_agent_spark.plans.queries_text import (
        _bpe_fertility_oracle,
        _bpe_oracle,
    )

    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["ab ab cd", "ab cd"]})
    docs = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)

    sdf = (
        bpe_fertility(docs, n_merges=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    odf = con.execute(_bpe_fertility_oracle(8)).df()
    odf = odf.sort_values("doc_id").reset_index(drop=True).astype(sdf.dtypes.to_dict())
    assert len(sdf) == 2, "exhausted vocab must still score every doc"
    assert sdf.equals(odf)

    # the merges twin must also agree on the truncated rule list
    from data_pipeline_agent_spark.operators.bpe import bpe_train

    m_s = bpe_train(docs, n_merges=8).toPandas().sort_values("merge_rank")
    m_o = con.execute(_bpe_oracle(8)).df().sort_values("merge_rank")
    assert list(m_s["token"]) == list(m_o["token"]) == ["ab", "cd"]
