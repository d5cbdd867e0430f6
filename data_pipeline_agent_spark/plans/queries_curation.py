"""Corpus-curation queries round 3: boilerplate detection, a unigram
language-model quality signal, per-source quality gating, deterministic
global shuffle, and mixture (temperature) weighting.

These are the remaining standard stages of a large-scale LLM training-data
pipeline (after dedup/contamination/sampling/packing in queries_corpus.py):

- boilerplate n-gram detection (CCNet-style: shingles shared by many
  documents are headers/footers/templates, not content);
- unigram surprisal (the cheap KenLM stand-in: per-document mean negative
  log-probability under the corpus's own unigram distribution — high
  surprisal = gibberish/rare-token soup, low = repetitive boilerplate);
- per-source quality-quantile gating (keep each source's best half rather
  than a global threshold that would wipe out whole sources);
- deterministic corpus shuffle into training shards (hash-ordered, no RNG,
  reproducible across engines/reruns/repartitions);
- mixture temperature weighting (w_i ∝ p_i^alpha, the standard multi-source
  sampling-temperature formula).

All are pure DataFrame plans with DuckDB oracle twins. The reference
(/root/reference/main.py) is a single-table profiler with none of these —
north-star extension surface per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_agent_spark.functions.text_hash import h32, tokens, word_ngrams
from data_pipeline_agent_spark.plans.registry import register, table
from data_pipeline_agent_spark.plans.sql_text import sql_h32, sql_ngrams, sql_tokens
from data_pipeline_agent_spark.session import fan_out

_BOILER_N = 4  # shingle width (same rationale as queries_corpus._CONTAM_N:
# the tiny synthetic vocabulary needs a narrow gram for real overlap)
_BOILER_MIN_DOCS = 3  # gram is "boilerplate" when >= this many docs contain it


@register(
    "boilerplate_grams_topk",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {sql_tokens('lower(text)')} AS w FROM documents
        ),
        g AS (
            SELECT doc_id, unnest({sql_ngrams('w', _BOILER_N)}) AS gram FROM toks
        )
        SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
        FROM g GROUP BY gram
        ORDER BY n_docs DESC, gram ASC LIMIT 20
    """,
    description="boilerplate mining: the 20 most widespread 4-word shingles "
    "(document frequency), the template/header candidates a curation "
    "pipeline strips",
)
def boilerplate_grams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle -> document-frequency -> top-k. One shuffle (the gram
    aggregate; shingling is map-side and word_ngrams emits per-doc
    DISTINCT grams, so count(*) IS the document frequency); top-20 is a
    TakeOrdered over the aggregate, never a global sort of the gram
    table."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    g = docs.select(
        "doc_id",
        F.explode(word_ngrams(tokens(F.lower(F.col("text"))), _BOILER_N)).alias("gram"),
    )
    return (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("gram"))
        .limit(20)
    )


@register(
    "source_boilerplate_share",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, {sql_tokens('lower(text)')} AS w FROM documents
        ),
        g AS (
            SELECT doc_id, source, unnest({sql_ngrams('w', _BOILER_N)}) AS gram
            FROM toks
        ),
        boiler AS (
            SELECT gram FROM g GROUP BY gram
            HAVING count(*) >= {_BOILER_MIN_DOCS}
        ),
        per_doc AS (
            SELECT g.doc_id, g.source,
                   count(*) AS n_grams,
                   count(*) FILTER (WHERE b.gram IS NOT NULL) AS n_boiler
            FROM g LEFT JOIN boiler b USING (gram)
            GROUP BY g.doc_id, g.source
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(n_boiler * 1.0 / n_grams), 6) AS boilerplate_share
        FROM per_doc GROUP BY source
    """,
    description=f"per-source boilerplate exposure: average share of a "
    f"document's 4-gram shingles that occur in >= {_BOILER_MIN_DOCS} "
    f"documents corpus-wide (CCNet-style template detection)",
)
def source_boilerplate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregates over one staged shingle table: gram->df, then
    doc->share. The exploded gram frame is persisted because both passes
    consume it (re-shingling would double the dominant md5-free explode
    cost). The boilerplate-gram set is inherently small (bounded by the
    template vocabulary, not the corpus) so its join side broadcasts at
    any scale; the flag is computed as a left join + conditional count,
    not a per-doc array intersection."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    g = docs.select(
        "doc_id",
        "source",
        F.explode(word_ngrams(tokens(F.lower(F.col("text"))), _BOILER_N)).alias("gram"),
    ).persist()
    try:
        boiler = (
            g.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") >= _BOILER_MIN_DOCS)
            .select("gram", F.lit(1).alias("__is_boiler"))
        )
        per_doc = (
            g.join(boiler, "gram", "left")
            .groupBy("doc_id", "source")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.count("__is_boiler").alias("n_boiler"),
            )
        )
        out = per_doc.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(F.col("n_boiler") / F.col("n_grams")), 6).alias(
                "boilerplate_share"
            ),
        )
        out = out.localCheckpoint(eager=True)
    finally:
        g.unpersist()
    return out


@register(
    "text_unigram_surprisal",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({sql_tokens('lower(text)')}) AS w FROM documents
        ),
        v AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        t AS (SELECT sum(c) AS total FROM v)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(-ln(c / total)), 6) AS surprisal
        FROM tok JOIN v USING (w), t
        GROUP BY doc_id
    """,
    description="unigram-LM quality signal: per-document mean negative "
    "log-probability of its tokens under the corpus unigram distribution "
    "(cheap KenLM stand-in; outliers on either end are curation flags)",
    materializes_on_build=True,  # ends in an eager localCheckpoint
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass LM scoring: (1) build the unigram table (one shuffle on
    the token; vocabulary grows with Heaps' law, far sublinear in corpus
    size), (2) join tokens back to their probabilities and aggregate per
    doc. The join strategy is left to AQE: a natural-language vocab
    broadcasts; a URL/typo-heavy 100 TB vocab may not, and forcing a hint
    here would be the label_encode mistake from round 1. The 1-row total
    is a broadcast cross join, same pattern as the scalar-aggregate
    queries in queries_cleaning."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w")
    ).persist()
    try:
        vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        total = vocab.agg(F.sum("c").alias("total"))
        scored = (
            tok.join(vocab, "w")
            .crossJoin(F.broadcast(total))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.round(F.avg(-F.log(F.col("c") / F.col("total"))), 6).alias(
                    "surprisal"
                ),
            )
        )
        # corpus-grain (per-doc) checkpoint: materializes the result so
        # `tok` can be unpersisted before returning. Lineage truncation
        # means a lost executor fails the query (outer retry recomputes);
        # reliable-checkpoint deployments swap checkpoint() in — see the
        # blast-radius note at grouped_ordered_prefix.
        scored = scored.localCheckpoint(eager=True)
    finally:
        tok.unpersist()
    return scored


@register(
    "source_quality_gate",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, source, n_chars,
                   percent_rank() OVER (PARTITION BY source
                        ORDER BY n_chars DESC, doc_id ASC) AS pr
            FROM documents
        )
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
               round(pr, 6) AS q_rank
        FROM ranked WHERE pr <= 0.5
    """,
    description="per-source quality gate: keep each source's top half by "
    "length score (percent_rank within source) — per-stratum gating "
    "instead of a global threshold that would drop whole sources",
)
def source_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sources are a BOUNDED domain over a corpus-scaling table, so
    ``Window.partitionBy(source)`` would put n/k rows on one reducer —
    the constant-cardinality variant of the unpartitioned-window hazard.
    Instead: ``grouped_ordered_prefix`` range-partitions once on
    (source, n_chars desc, doc_id) and reconstructs each source's exact
    rank from per-source offsets; percent_rank = (rank-1)/(n-1) with the
    same total order (doc_id tiebreak), identical to the window's output
    row-for-row. The doc_id tiebreak makes the kept set deterministic
    and engine-independent."""
    from data_pipeline_agent_spark.operators.ranking import grouped_ordered_prefix

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    ranked = grouped_ordered_prefix(
        docs,
        ["source"],
        [F.desc("n_chars"), F.asc("doc_id")],
        rank_col="__rk",
        n_col="__n",
    )
    pr = F.when(
        F.col("__n") > 1,
        (F.col("__rk") - 1).cast("double") / (F.col("__n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        ranked.withColumn("pr", pr)
        .where(F.col("pr") <= 0.5)
        .select("doc_id", "source", "n_chars", F.round("pr", 6).alias("q_rank"))
    )


_SHUFFLE_SALT = "shuffle42:"
_N_SHARDS = 8


@register(
    "corpus_shuffle_shards",
    oracle=f"""
        WITH k AS (
            SELECT doc_id,
                   md5('{_SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)) AS key,
                   {sql_h32(f"'{_SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)")}
                       % {_N_SHARDS} AS shard
            FROM documents
        )
        SELECT doc_id, CAST(shard AS BIGINT) AS shard,
               CAST(row_number() OVER (PARTITION BY shard
                    ORDER BY key ASC, doc_id ASC) AS BIGINT) AS pos
        FROM k
    """,
    description="deterministic training-order shuffle: md5-keyed shard "
    "assignment + within-shard position, reproducible across engines, "
    "reruns, and repartitions (no RNG, no global sort)",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global-shuffle step that precedes training-shard writes. A true
    global row_number would be a single-reducer sort — and so would a
    per-shard window: _N_SHARDS is a constant, so each shard's window
    partition is n/shards rows on one reducer. ``grouped_ordered_prefix``
    computes the identical within-shard position from one range shuffle
    on (shard, md5 key, doc_id) plus per-shard offsets; the md5 sort key
    gives a uniform pseudo-random order, reproducible across engines,
    reruns, and repartitions (no RNG)."""
    from data_pipeline_agent_spark.operators.ranking import grouped_ordered_prefix

    docs = table(spark, sf_dir, "documents")
    salted = F.concat(F.lit(_SHUFFLE_SALT), F.col("doc_id").cast("string"))
    keyed = docs.select(
        "doc_id",
        F.md5(salted).alias("__key"),
        F.pmod(h32(salted), F.lit(_N_SHARDS)).cast("long").alias("shard"),
    )
    pos = grouped_ordered_prefix(
        keyed, ["shard"], [F.asc("__key"), F.asc("doc_id")], rank_col="pos"
    )
    return pos.select("doc_id", "shard", F.col("pos").cast("long").alias("pos"))


_MIX_ALPHA = 0.7  # sampling temperature: w_i ∝ p_i^alpha


@register(
    "mixture_temperature_weights",
    oracle=f"""
        WITH t AS (
            SELECT source, sum(len({sql_tokens('text')})) AS n_tokens
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT sum(n_tokens) AS total,
                   sum(pow(n_tokens, {_MIX_ALPHA})) AS denom
            FROM t
        )
        SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
               round(n_tokens / total, 6) AS p_raw,
               round(pow(n_tokens, {_MIX_ALPHA}) / denom, 6) AS w_temp
        FROM t, tot
    """,
    description=f"multi-source mixture weights at sampling temperature "
    f"alpha={_MIX_ALPHA}: w_i ∝ p_i^alpha normalized (note w_i depends "
    f"only on token counts: (tok_i/T)^a / Σ(tok_j/T)^a = tok_i^a / Σtok_j^a)",
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One grouped aggregate (per-source token totals — 20 rows here,
    thousands at worst in production) + a 1-row scalar aggregate broadcast
    back over it. The per-source table is dimension-sized by construction,
    so every step after the first aggregate is driver-trivial."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    t = (
        docs.select("source", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    tot = t.agg(
        F.sum("n_tokens").alias("total"),
        F.sum(F.pow("n_tokens", F.lit(_MIX_ALPHA))).alias("denom"),
    )
    return t.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_tokens") / F.col("total"), 6).alias("p_raw"),
        F.round(F.pow("n_tokens", F.lit(_MIX_ALPHA)) / F.col("denom"), 6).alias(
            "w_temp"
        ),
    )


_CHUNK_TOKENS = 32  # context-window budget per chunk
_CHUNK_STRIDE = 24  # overlap = _CHUNK_TOKENS - _CHUNK_STRIDE tokens


@register(
    "doc_chunks_fixed_stride",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {sql_tokens('text')} AS w FROM documents
        ),
        s AS (
            SELECT doc_id, w,
                   unnest(generate_series(1, len(w), {_CHUNK_STRIDE})) AS start
            FROM t
        )
        SELECT doc_id,
               CAST((start - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(len(list_slice(w, start, start + {_CHUNK_TOKENS} - 1)) AS BIGINT)
                   AS n_chunk_tokens,
               array_to_string(list_slice(w, start, start + {_CHUNK_TOKENS} - 1), ' ')
                   AS chunk_text
        FROM s
    """,
    description=f"context-window chunking: overlapping {_CHUNK_TOKENS}-token "
    f"chunks at stride {_CHUNK_STRIDE} (the pretraining/RAG document "
    f"splitter), chunk index and text per row",
)
def doc_chunks_fixed_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking as a pure column plan: stage the token array once, explode
    the stride-spaced start offsets (sequence + explode is the lateral
    generate_series), slice per start. Map-side only — no shuffle at all;
    at 100 TB this runs entirely inside the scan stage and the output
    (×~expansion_factor rows) streams straight to the sink. The chunk
    count per doc is ceil(n/stride), matching the oracle's inclusive
    generate_series."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    s = t.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(F.lit(1), F.size("w"), F.lit(_CHUNK_STRIDE))
        ).alias("start"),
    )
    sl = F.slice(F.col("w"), F.col("start"), F.lit(_CHUNK_TOKENS))
    return s.select(
        "doc_id",
        ((F.col("start") - 1) / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.size(sl).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", sl).alias("chunk_text"),
    )


@register(
    "source_overlap_matrix",
    oracle=f"""
        WITH toks AS (
            SELECT source, {sql_tokens('lower(text)')} AS w FROM documents
        ),
        g AS (
            SELECT DISTINCT source, unnest({sql_ngrams('w', _BOILER_N)}) AS gram
            FROM toks
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        GROUP BY a.source, b.source
    """,
    description="cross-source leakage matrix: distinct 4-gram shingles "
    "shared by each source pair — the audit for content duplication "
    "across supposedly-independent corpus sources",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level overlap emitted MAP-SIDE from each gram's sorted
    distinct source set (r13, guide §2.4 — the basket_brand_pairs move):
    one exchange on the gram builds the per-gram ``collect_set`` of
    sources (which also does the (source, gram) dedup the old separate
    ``distinct`` step paid its own exchange for), then every i<j source
    pair streams out of the sorted array with no join at all. The old
    persisted distinct + gram-keyed self-join shape cost four wide
    exchanges of the corpus-scale gram table (distinct, one per
    self-join side — the cached plan's AdaptiveSparkPlan hides its
    partitioning, so EnsureRequirements re-shuffled both — plus the
    final aggregate); now two, and nothing is cached. The per-gram set
    is bounded by n_sources at ANY corpus size, so collect_set state and
    the C(set, 2) fan-out stay tiny; output is n_sources^2/2 rows as
    before. Identical pair algebra: i<j over the sorted distinct source
    set == source_a < source_b over the distinct (source, gram)
    self-join (plans/r13/source_overlap_matrix_{before,after}.txt)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    g = (
        docs.select(
            "source",
            F.explode(
                word_ngrams(tokens(F.lower(F.col("text"))), _BOILER_N)
            ).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.array_sort(F.collect_set("source")).alias("__ss"))
        .where(F.size("__ss") >= 2)
    )
    ei = g.select(
        "__ss",
        F.explode(F.sequence(F.lit(1), F.size("__ss") - 1)).alias("__i"),
    )
    cand = ei.select(
        F.element_at(F.col("__ss"), F.col("__i")).alias("source_a"),
        F.explode(
            F.slice(F.col("__ss"), F.col("__i") + 1, F.size("__ss"))
        ).alias("source_b"),
    )
    return cand.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_grams")
    )


@register(
    "text_bigram_surprisal",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {sql_tokens('lower(text)')} AS w FROM documents
        ),
        bg AS (
            SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
            FROM (
                SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
                FROM toks WHERE len(w) >= 2
            )
        ),
        c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, sum(c) AS cp FROM c12 GROUP BY w1),
        v AS (
            SELECT count(DISTINCT tok) AS vocab
            FROM (SELECT unnest(w) AS tok FROM toks)
        )
        SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(-ln((c + 1.0) / (cp + vocab))), 6) AS bigram_surprisal
        FROM bg
        JOIN c12 USING (w1, w2)
        JOIN c1 USING (w1), v
        GROUP BY bg.doc_id
    """,
    description="bigram-LM quality signal with add-one smoothing: per-doc "
    "mean -ln P(w2|w1) under the corpus's own bigram distribution — the "
    "sharper sibling of text_unigram_surprisal (catches unnatural word "
    "ORDER, not just rare words)",
    materializes_on_build=True,  # ends in an eager localCheckpoint
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigrams are built map-side by zipping the token array with its
    own 1-shifted slice (no positional self-join of an exploded table —
    that would shuffle on (doc, pos) for data that is adjacent by
    construction). Conditional counts reuse the bigram table: the prefix
    total is the per-w1 sum of bigram counts, so only ONE count
    aggregate touches corpus-sized data; vocab is a 1-row broadcast.
    Join strategy for the count tables is AQE's call (same Heaps'-law
    rationale as the unigram query)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("w"))
    pairs = F.arrays_zip(
        F.slice(F.col("w"), 1, F.size("w") - 1).alias("w1"),
        F.slice(F.col("w"), 2, F.size("w") - 1).alias("w2"),
    )
    bg = (
        t.where(F.size("w") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .persist()
    )
    try:
        c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
        c1 = c12.groupBy("w1").agg(F.sum("c").alias("cp"))
        v = (
            t.select(F.explode("w").alias("tok"))
            .agg(F.countDistinct("tok").alias("vocab"))
        )
        out = (
            bg.join(c12, ["w1", "w2"])
            .join(c1, "w1")
            .crossJoin(F.broadcast(v))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.round(
                    F.avg(-F.log((F.col("c") + F.lit(1.0)) / (F.col("cp") + F.col("vocab")))),
                    6,
                ).alias("bigram_surprisal"),
            )
        )
        # corpus-grain (per-doc) checkpoint — same rationale and
        # blast-radius note as text_unigram_surprisal above.
        out = out.localCheckpoint(eager=True)
    finally:
        bg.unpersist()
    return out


@register(
    "corpus_dsir_logratio",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, lang, unnest({sql_tokens('lower(text)')}) AS w
            FROM documents
        ),
        g AS (
            SELECT doc_id, lang, w, count(*) AS c
            FROM tok GROUP BY doc_id, lang, w
        ),
        v AS (
            SELECT w, sum(c) AS cs,
                   coalesce(sum(c) FILTER (lang = 'en'), 0) AS ct
            FROM g GROUP BY w
        ),
        t AS (SELECT sum(cs) AS ts, sum(ct) AS tt, count(*) AS vsz FROM v)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               round(sum(c * (ln((ct + 1.0) / (tt + vsz))
                              - ln((cs + 1.0) / (ts + vsz)))) / sum(c), 6)
                 AS dsir_logratio
        FROM g JOIN v USING (w), t
        GROUP BY doc_id
    """,
    description="DSIR importance weighting (Xie et al. 2023): per-document "
    "mean log-likelihood ratio between an add-one-smoothed unigram LM of "
    "the TARGET slice (lang='en') and of the full corpus — the importance-"
    "resampling score that upweights target-like documents in the raw pool",
    materializes_on_build=True,  # ends in an eager localCheckpoint
)
def corpus_dsir_logratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling, the unigram-LM variant
    (Xie et al. 2023, public): score(d) = mean_w [ln p_target(w) -
    ln p_raw(w)], both LMs add-one smoothed over the SHARED corpus vocab.

    One exploded token pass feeds BOTH language models: the vocab
    aggregate computes the raw count and the target-slice count in the
    same map-side-combined groupBy (a conditional sum, not a second
    scan), the three totals are a 1-row broadcast, and the score join is
    the same Heaps'-law vocab join as text_unigram_surprisal — AQE picks
    broadcast vs shuffle. The target slice is defined by a column
    predicate, so no second corpus ever materializes; at 100 TB the
    marginal cost over plain surprisal is one long column in the vocab
    shuffle.

    r10 (r9 verdict task 4): the score join's probe side is
    pre-aggregated to (doc, word, cnt) — one extra map-side-combinable
    groupBy shrinks the vocab join's input by the within-doc repeat
    factor (this query posted the tier table's second-highest ratio at
    token grain). The per-doc score becomes sum(cnt * logratio) /
    sum(cnt); the oracle applies the identical regrouping, so both
    engines sum the same (doc, word)-grain multiset."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    grouped = (
        docs.select(
            "doc_id",
            F.explode(tokens(F.lower(F.col("text")))).alias("w"),
            (F.col("lang") == "en").alias("tgt"),
        )
        .groupBy("doc_id", "w", "tgt")  # tgt is per-doc constant
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    try:
        vocab = grouped.groupBy("w").agg(
            F.sum("c").alias("cs"),
            F.sum(F.when(F.col("tgt"), F.col("c")).otherwise(0)).alias("ct"),
        )
        totals = vocab.agg(
            F.sum("cs").alias("ts"),
            F.sum("ct").alias("tt"),
            F.count(F.lit(1)).alias("vsz"),
        )
        out = (
            grouped.join(vocab, "w")
            .crossJoin(F.broadcast(totals))
            .groupBy("doc_id")
            .agg(
                F.sum("c").cast("long").alias("n_tokens"),
                F.round(
                    F.sum(
                        F.col("c")
                        * (
                            F.log(
                                (F.col("ct") + F.lit(1.0))
                                / (F.col("tt") + F.col("vsz"))
                            )
                            - F.log(
                                (F.col("cs") + F.lit(1.0))
                                / (F.col("ts") + F.col("vsz"))
                            )
                        )
                    )
                    / F.sum("c"),
                    6,
                ).alias("dsir_logratio"),
            )
        )
        # corpus-grain checkpoint — same rationale/blast-radius note as
        # text_unigram_surprisal.
        out = out.localCheckpoint(eager=True)
    finally:
        grouped.unpersist()
    return out
