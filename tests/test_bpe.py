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


# --- batched merge rounds (r10, r9 verdict task 1) ---------------------------


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Pure-Python sequential BPE reference (subword-nmt semantics over
    the word-frequency table): the ground truth both batch=1 and
    batch=M Spark runs must reproduce rule-for-rule."""
    from collections import Counter

    vocab = {w: (list(w), f) for w, f in words.items()}
    merges = []
    for k in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((k, l, r, l + r, c))
        for w, (syms, f) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, f)
    return merges


def _train_rules(spark, text: str, n: int, batch: int):
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = bpe_train(docs, n_merges=n, batch=batch).collect()
    return [(r["merge_rank"], r["lhs"], r["rhs"], r["token"], r["cnt"]) for r in out]


def _word_counts(text: str) -> dict[str, int]:
    from collections import Counter

    return dict(Counter(text.split()))


def _assert_modes_match_reference(spark, text: str, n: int, batches=(3, 16)):
    want = _ref_bpe(_word_counts(text), n)
    got_seq = _train_rules(spark, text, n, batch=1)
    assert got_seq == want, f"sequential != reference:\n{got_seq}\n{want}"
    for b in batches:
        got_b = _train_rules(spark, text, n, batch=b)
        assert got_b == want, f"batch={b} != sequential:\n{got_b}\n{want}"


def test_bpe_batched_self_pair_rule_closes_batch(spark):
    # THE divergence case _select_batch condition 3 exists for: (a,a)
    # over "aaaa" leaves (aa,aa) pairs behind whose count (10) outranks
    # the disjoint (x,y)=4 — a naive disjoint batch would pick (x,y)
    # second, sequential picks (aa,aa). Batched must match sequential.
    text = " ".join(["aaaa"] * 10 + ["xy"] * 4)
    _assert_modes_match_reference(spark, text, n=4)


def test_bpe_batched_interacting_top_pairs(spark):
    # (a,b) wins; (b,a) interacts and ranks second: the prefix must stop
    # there (pairs created by (a,b) — e.g. (ab,ab) — derive from (b,a))
    text = " ".join(["abab"] * 6 + ["cd"] * 3)
    _assert_modes_match_reference(spark, text, n=4)


def test_bpe_batched_tie_at_the_boundary(spark):
    # counts engineered so the first excluded pair TIES the last
    # accepted one: condition 4's strict gap must drop the tied rule
    # from the batch (sequential breaks the tie lexicographically
    # against pairs the batch may have minted)
    text = " ".join(["ab"] * 5 + ["cd"] * 5 + ["ce"] * 5 + ["fg"] * 4)
    _assert_modes_match_reference(spark, text, n=5)


def test_bpe_batched_cascades_randomized(spark):
    # tiny-alphabet randomized corpora: dense with overlapping runs,
    # ties, lhs==rhs rules, and multi-char cascades — every seed must
    # agree with the pure-Python sequential reference in BOTH modes
    import random

    for seed in (7, 23):
        rnd = random.Random(seed)
        words = [
            "".join(rnd.choice("ab") for _ in range(rnd.randint(1, 6)))
            for _ in range(25)
        ]
        text = " ".join(w for w in words for _ in range(rnd.randint(1, 4)))
        _assert_modes_match_reference(spark, text, n=10, batches=(4,))


def test_bpe_batched_exhaustion_and_minted_pairs(spark):
    # supply exhausts below n_merges: batched must keep training on the
    # pairs its own merges mint ((a,a) -> (aa,aa) -> ...) and stop
    # exactly where sequential stops
    text = " ".join(["aaaaaaaa"] * 3)
    _assert_modes_match_reference(spark, text, n=8)


def test_select_batch_unit_conditions():
    from data_pipeline_agent_spark.operators.bpe import _select_batch

    # condition 1+2: prefix stops at the first interacting pair, even if
    # later pairs are disjoint
    ranked = [("a", "b", 10), ("b", "c", 8), ("x", "y", 7)]
    assert _select_batch(ranked, 4, exhaustive=True) == [("a", "b", 10)]
    # condition 3: lhs==rhs closes the batch after itself
    ranked = [("a", "a", 10), ("x", "y", 7)]
    assert _select_batch(ranked, 4, exhaustive=True) == [("a", "a", 10)]
    # condition 4: tie across the boundary drops the tied tail
    ranked = [("a", "b", 10), ("c", "d", 7), ("c", "e", 7)]
    assert _select_batch(ranked, 2, exhaustive=True) == [("a", "b", 10)]
    # clean disjoint prefix: all accepted
    ranked = [("a", "b", 10), ("c", "d", 7), ("e", "f", 3)]
    assert _select_batch(ranked, 4, exhaustive=True) == ranked
    # truncated window: last row is only a sentinel bound, never selected
    ranked = [("a", "b", 10), ("c", "d", 7)]
    assert _select_batch(ranked, 4, exhaustive=False) == [("a", "b", 10)]
    # fallback is always the sequential argmax
    ranked = [("a", "b", 7), ("c", "d", 7)]
    assert _select_batch(ranked, 2, exhaustive=False) == [("a", "b", 7)]


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
