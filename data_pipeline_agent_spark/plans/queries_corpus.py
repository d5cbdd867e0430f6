"""Training-corpus management queries: contamination, sampling, packing.

Beyond the curation funnel (queries_text.py), a 100 TB training-data
pipeline needs: benchmark-contamination detection (n-gram overlap with an
eval set), deterministic stratified sampling (re-runs must pick the SAME
documents — no RNG), sequence packing (fill fixed token budgets), and
per-source corpus stats. All four are pure DataFrame plans with DuckDB
oracle twins; determinism comes from md5 arithmetic shared with the dedup
stack (functions/text_hash.py), never from Spark/DuckDB RNG.

The reference (/root/reference/main.py) is a single-table profiler with
none of these — north-star extension surface per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_agent_spark.functions.text_hash import tokens, word_ngrams
from data_pipeline_agent_spark.plans.registry import register, table
from data_pipeline_agent_spark.session import fan_out
from data_pipeline_agent_spark.plans.sql_text import sql_h32, sql_ngrams, sql_tokens

# Eval-set membership: a deterministic 1/97 slice of the corpus stands in
# for a benchmark suite (the container ships no external eval files).
_EVAL_MOD = 97
_CONTAM_N = 4  # word n-gram width for contamination; production corpora use
# ~13-token shingles, but the ~54-word synthetic docs draw from a tiny
# vocabulary, so 4 is the width at which genuine cross-slice overlap exists
# (8-grams: zero hits at sf0.01, which would make the check vacuous)


@register(
    "contamination_ngram_overlap",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {sql_tokens('lower(text)')} AS w FROM documents
        ),
        g AS (
            SELECT doc_id, unnest({sql_ngrams('w', _CONTAM_N)}) AS gram FROM toks
        ),
        ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_EVAL_MOD} = 0),
        tr AS (SELECT doc_id, gram FROM g WHERE doc_id % {_EVAL_MOD} <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM tr JOIN ev USING (gram)
        GROUP BY doc_id
    """,
    description="benchmark-contamination check: training docs sharing any "
    "4-word-gram with the (deterministic 1/97) eval slice, with the count "
    "of distinct shared shingles per contaminated doc",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at scale: shingle both corpus slices, equi-join on
    the shingle. Both sides are distinct-projected BEFORE the join (the
    shingle explode is map-side; the only shuffles are the two distincts
    and the gram-keyed join — no all-pairs doc comparison anywhere). At
    100 TB the eval side is the benchmark suite: thousands of docs, so its
    distinct gram set broadcasts; here it is 1/97 of the corpus and the
    join strategy is left to AQE.

    word_ngrams already emits DISTINCT shingles per doc, so the train side
    needs no extra dedup before the count."""
    docs = fan_out(table(spark, sf_dir, "documents"))

    def grams_of(d):
        return d.select(
            "doc_id",
            F.explode(
                word_ngrams(tokens(F.lower(F.col("text"))), _CONTAM_N)
            ).alias("gram"),
        )

    # Slice filters sit BELOW the explode on each branch, so each side
    # tokenizes only its own documents (the shared-grams frame would be
    # shingled twice, once per consumer, without a persist).
    ev = grams_of(docs.where(F.col("doc_id") % _EVAL_MOD == 0)).select("gram").distinct()
    tr = grams_of(docs.where(F.col("doc_id") % _EVAL_MOD != 0))
    return (
        tr.join(ev, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )


@register(
    "sample_stratified_deterministic",
    oracle="""
        SELECT doc_id, lang
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < (CASE WHEN lang = 'en' THEN '80' ELSE '40' END)
    """,
    description="deterministic stratified sampling: keep en at 50% and "
    "other languages at 25% by comparing the first md5 byte of the doc id "
    "against a per-stratum threshold — identical pick-set on every run "
    "and every engine, no RNG",
)
def sample_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.sample()/sampleBy() draw from a seeded RNG whose stream depends
    on partitioning — a repartition changes the picked rows, which is
    unacceptable for a training corpus (re-runs must reproduce the exact
    dataset). Hash-thresholding the stable doc key is the standard fix:
    the predicate is a pure scan-stage expression (no shuffle, no state),
    rates are per-stratum CASE thresholds on the first md5 byte
    (0x80/256 = 50%, 0x40/256 = 25%)."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thr = F.when(F.col("lang") == "en", F.lit("80")).otherwise(F.lit("40"))
    return docs.where(bucket < thr).select("doc_id", "lang")


_PACK_BUDGET = 512  # tokens per packed sequence


@register(
    "pack_sequences_by_source",
    oracle=f"""
        WITH t AS (
            SELECT source, doc_id,
                   len({sql_tokens('text')}) AS n_tokens
            FROM documents
        ),
        b AS (
            SELECT source, n_tokens,
                   CAST(floor(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {_PACK_BUDGET}) AS BIGINT) AS bin
            FROM t
        )
        SELECT source, bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM b GROUP BY source, bin
    """,
    description=f"sequence packing: assign docs (doc_id order, per source) "
    f"to {_PACK_BUDGET}-token training bins by cumulative token count; "
    f"reports docs and tokens per bin",
)
def pack_sequences_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill packing for training-sequence construction: within
    each source, documents in stable doc_id order are assigned to the bin
    their preceding cumulative token count falls in. Sources are a
    bounded domain over a corpus-scaling table, so a per-source running-
    sum window would put n/k rows on one reducer; instead
    ``grouped_ordered_prefix`` range-partitions once on (source, doc_id)
    and reconstructs each source's exclusive prefix sum (inclusive cum
    minus own tokens) from per-source offsets. Greedy first-fit would
    need sequential state; the cumulative-quotient rule is
    order-parallel, deterministic, and within one document of the same
    packing efficiency. Exactness note: the distributed cum is a double;
    integer-exact below 2^53 total tokens per source (~9e15, far past a
    100 TB corpus)."""
    from data_pipeline_agent_spark.operators.ranking import grouped_ordered_prefix

    docs = fan_out(table(spark, sf_dir, "documents"))
    t = docs.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    pref = grouped_ordered_prefix(
        t, ["source"], [F.asc("doc_id")], value_col="n_tokens", cum_col="__cum"
    )
    binned = pref.withColumn(
        "bin",
        F.floor((F.col("__cum") - F.col("n_tokens")) / _PACK_BUDGET).cast("long"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "source_token_stats",
    materializes_on_build=True,
    oracle=f"""
        WITH t AS (
            SELECT source, len({sql_tokens('text')}) AS n_tokens FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
               round(quantile_cont(n_tokens, 0.9), 6) AS p90_tokens
        FROM t GROUP BY source
    """,
    description="per-source corpus inventory: doc count, token total, "
    "exact p50/p90 token-length percentiles (one grouped aggregate)",
)
def source_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source inventory with EXACT percentiles but no grouped
    ``F.percentile``: sources are bounded while groups scale, so the
    exact aggregate would buffer n/k token counts per reducer. The
    tokenized narrow frame (source, n_tokens — ~16 bytes/doc) is
    localCheckpointed so tokenization runs ONCE; the count/sum aggregate
    and ``exact_percentiles``'s scan-only selection passes all read the
    checkpoint.

    A NULL source forms its own group (SQL GROUP BY semantics, matching
    the oracle): since r13 the NULL key rides the SAME fused pass-1
    aggregate and probe passes as every other source —
    ``grouped_exact_percentiles(include_null_key=True)`` resolves it with
    IS NULL probe predicates — and the count/sum base aggregate
    piggybacks on pass 1 via ``extra_aggs`` (guide §1.2: the old shape
    ran a dedicated base aggregate + collect, a separate NULL-slice
    percentile pass, and a driver-side join; this is the r12 "NULL-key
    side path" deferral, closed as VERDICT r12 task 2)."""
    from data_pipeline_agent_spark.operators.ranking import (
        grouped_exact_percentiles,
    )

    docs = fan_out(table(spark, sf_dir, "documents"))
    # corpus-grain checkpoint (16 bytes/doc): lost executor blocks are
    # unrecoverable (lineage truncated) and fail the query — acceptable
    # because all consumers collect inside this builder, so the outer
    # retry simply re-tokenizes; reliable-checkpoint deployments swap
    # checkpoint() in (same note as approx_percentiles_extendedprice).
    t = (
        docs.select("source", F.size(tokens(F.col("text"))).alias("n_tokens"))
        .localCheckpoint(eager=False)  # materialized by fused pass 1 (r12)
    )
    pct = grouped_exact_percentiles(
        t,
        "source",
        "n_tokens",
        [0.5, 0.9],
        ["p50", "p90"],
        include_null_key=True,
        extra_aggs=[
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        ],
        extra_schema="n_docs bigint, total_tokens bigint",
    )
    return pct.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round("p50", 6).alias("p50_tokens"),
        F.round("p90", 6).alias("p90_tokens"),
    )


# --- incremental dedup against a prior snapshot -------------------------------

# "new batch" = the deterministic 1/5 slice; everything else plays the
# already-ingested snapshot corpus
_BATCH_MOD = 5


@register(
    "dedup_incremental_new_docs",
    oracle=f"""
        SELECT n.doc_id, n.source
        FROM documents n
        WHERE n.doc_id % {_BATCH_MOD} = 0
          AND NOT EXISTS (
              SELECT 1 FROM documents s
              WHERE s.doc_id % {_BATCH_MOD} <> 0
                AND md5(s.text) = md5(n.text)
          )
    """,
    description="incremental ingestion dedup: new-batch docs whose exact "
    "text hash does not already exist in the prior snapshot (anti-join on "
    "the content hash)",
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-2 dedup problem: dedup an incoming batch AGAINST the
    existing corpus without re-deduping the corpus. One left-anti join on
    the md5 content hash; the snapshot side is projected to the hash
    column only before the join (at 100 TB that projection — not the
    documents — is what shuffles, and Spark's runtime bloom filter prunes
    most new-batch rows before the exchange)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    new = docs.where(F.col("doc_id") % _BATCH_MOD == 0).select(
        "doc_id", "source", F.md5("text").alias("__h")
    )
    snap = docs.where(F.col("doc_id") % _BATCH_MOD != 0).select(
        F.md5("text").alias("__h")
    )
    return new.join(snap, "__h", "left_anti").select("doc_id", "source")


# --- deterministic quality-weighted sampling ----------------------------------

# Knuth multiplicative hash: pure integer arithmetic shared bit-for-bit by
# Spark and DuckDB (md5-hex is the string equivalent used by the
# stratified sampler; this is the cheaper path when the key is an int)
_KNUTH = 2654435761


@register(
    "sample_quality_weighted",
    oracle=f"""
        SELECT doc_id, n_chars,
               round(least(1.0, n_chars / 500.0), 6) AS keep_prob
        FROM documents
        WHERE (doc_id * {_KNUTH}) % 1000000
              < least(1.0, n_chars / 500.0) * 1000000
    """,
    description="deterministic quality-weighted sampling: keep probability "
    "proportional to document length (capped at 1), decided by a Knuth "
    "multiplicative hash of the doc id — identical pick-set on every run "
    "and engine, no RNG",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus downsampling without RNG: u = knuth(doc_id) in
    [0, 1) compared against a per-document keep probability (here a
    length prior; swap in any quality score). A pure scan-stage
    predicate — no shuffle, no state, reproducible across reruns,
    engines, and repartitioning, which df.sample() is not."""
    docs = table(spark, sf_dir, "documents")
    u = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(1_000_000)
    keep_prob = F.least(F.lit(1.0), F.col("n_chars") / F.lit(500.0))
    return docs.where(u < keep_prob * F.lit(1_000_000)).select(
        "doc_id", "n_chars", F.round(keep_prob, 6).alias("keep_prob")
    )


def density_penalized_topk(
    docs: DataFrame,
    emb: DataFrame,
    k: int = 100,
    bits: int | None = None,
    rotations: int | None = None,
    n_hint: int | None = None,
    dim_hint: int | None = None,
) -> DataFrame:
    """Density-penalized priority sampling (r11, r10 verdict task 5 —
    the SSL-prototypes/D4 curation signal): weight = quality / (1 +
    kNN-density), so the exact-k weighted sampler drains redundant
    regions first and keeps sparse novel ones. Composes two verified
    stages: sim_knn_density's summed top-3 bucket-neighbor cosine (the
    redundancy score; docs without a vector or without bucket neighbors
    get density 0) and sample_weighted_priority's Duffield/Lund/Thorup
    priority rule (pri = w * 2^32 / (h+1), one IEEE division of
    bit-identical operands — no RNG, identical pick-set on every
    run/layout/engine). Both weight inputs are the 6-dp-rounded values
    the twins already hash-match, so the derived priority is
    bit-identical cross-engine too.

    The graph runs in the SCALE-DEFAULT adaptive mode (r11: the first
    tier probe of this query ran it on the pinned-SIGN_BITS graph and
    measured 38x/decade — fixed-width buckets saturate, and the bucket
    self-join goes quadratic; adaptive bits hold expected bucket size
    constant). Tests pin ``bits``/``rotations`` to get deterministic
    bucket layouts on hand-built fixtures."""
    from pyspark.sql import Window

    from data_pipeline_agent_spark.functions.text_hash import h32
    from data_pipeline_agent_spark.operators.similarity import knn_graph
    from data_pipeline_agent_spark.operators.text import quality_score

    g = knn_graph(
        emb,
        k=3,
        bits=bits,
        rotations=rotations,
        n_hint=n_hint,
        dim_hint=dim_hint,
    )
    dens = g.groupBy(F.col("query_id").alias("doc_id")).agg(
        F.round(F.sum("cos_sim"), 6).alias("density")
    )
    q = quality_score(docs).select("doc_id", "quality_score")
    base = q.join(dens, "doc_id", "left").select(
        "doc_id",
        "quality_score",
        F.coalesce("density", F.lit(0.0)).alias("density"),
    )
    pri = (
        F.greatest(F.col("quality_score"), F.lit(0.0))
        / (F.lit(1.0) + F.col("density"))
        * F.lit(4294967296.0)
        / (h32(F.col("doc_id")) + F.lit(1))
    )
    ranked = (
        base.select("doc_id", "quality_score", "density", pri.alias("pri"))
        .orderBy(F.desc("pri"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("pri"), F.asc("doc_id"))
    return ranked.select(
        "doc_id",
        "quality_score",
        "density",
        "pri",
        F.row_number().over(w).cast("long").alias("rk"),
    )


def _density_penalized_oracle(k: int) -> str:
    from data_pipeline_agent_spark.plans.queries_dedup import _quality_sql
    from data_pipeline_agent_spark.plans.queries_similarity import (
        _SQL_ADAPTIVE_GRAPH_CTES,
    )

    return f"""
        WITH {_SQL_ADAPTIVE_GRAPH_CTES},
        knn AS (
          SELECT query_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id
                      ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
          FROM scored QUALIFY rk <= 3
        ),
        dens AS (
          SELECT query_id AS doc_id, round(sum(cos_sim), 6) AS density
          FROM knn GROUP BY query_id
        ),
        q AS ({_quality_sql()}),
        pw AS (
          SELECT q.qid AS doc_id, q.qs AS quality_score,
                 coalesce(d.density, 0.0) AS density,
                 greatest(q.qs, 0.0) / (1.0 + coalesce(d.density, 0.0))
                   * 4294967296.0
                   / ({sql_h32("CAST(q.qid AS VARCHAR)")} + 1) AS pri
          FROM q LEFT JOIN dens d ON d.doc_id = q.qid
        )
        SELECT doc_id, quality_score, density, pri,
               CAST(row_number() OVER (ORDER BY pri DESC, doc_id ASC)
                    AS BIGINT) AS rk
        FROM pw
        QUALIFY rk <= {k}
    """


@register(
    "sample_density_penalized",
    oracle=_density_penalized_oracle(100),
    description="density-penalized exact-k sampling (r11): priority "
    "weight = quality / (1 + kNN-density) composed from sim_knn_density's "
    "redundancy score (SCALE-DEFAULT adaptive graph — the pinned-bits "
    "variant measured 38x/decade before the r11 fix) and the "
    "Duffield/Lund/Thorup priority rule — dense near-dup regions drain "
    "first, sparse novel docs survive; deterministic md5 uniforms, "
    "bit-identical pick-set cross-engine, exact-hash twin",
)
def sample_density_penalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_agent_spark.plans.queries_similarity import EMB_DIM
    from data_pipeline_agent_spark.plans.registry import table_num_rows

    return density_penalized_topk(
        table(spark, sf_dir, "documents"),
        table(spark, sf_dir, "embeddings"),
        k=100,
        n_hint=table_num_rows(sf_dir, "embeddings"),
        dim_hint=EMB_DIM,
    )


@register(
    "sample_weighted_priority",
    oracle=f"""
        WITH p AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 greatest(n_chars, 1) * 4294967296.0
                   / ({sql_h32("CAST(doc_id AS VARCHAR)")} + 1) AS pri
          FROM documents
        )
        SELECT doc_id, n_chars, pri,
               CAST(row_number() OVER (ORDER BY pri DESC, doc_id ASC)
                    AS BIGINT) AS rk
        FROM p
        QUALIFY rk <= 100
    """,
    description="exact-k weighted sample via PRIORITY SAMPLING (Duffield/"
    "Lund/Thorup 2007): priority = weight/u with u a deterministic md5 "
    "uniform in (0,1], keep the top-100 priorities — weighted-without-"
    "replacement with unbiased subset-sum estimators, no RNG, identical "
    "pick-set on every run/layout/engine",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The priority is ONE IEEE division of exact integers (w * 2^32 /
    (h+1)); unlike the Efraimidis-Spirakis exponential keys (ln(u)/w),
    it involves no libm transcendental, so Spark and DuckDB produce the
    SAME double bit-for-bit and the selected set cannot flip on a
    boundary ulp. Top-k is TakeOrdered (map-side partial top-100, no
    global sort); the weight here is document length, standing in for
    any per-doc quality weight."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.functions.text_hash import h32

    docs = table(spark, sf_dir, "documents")
    pri = (
        F.greatest(F.col("n_chars"), F.lit(1)) * F.lit(4294967296.0)
        / (h32(F.col("doc_id")) + F.lit(1))
    )
    ranked = (
        docs.select(
            "doc_id", F.col("n_chars").cast("long").alias("n_chars"),
            pri.alias("pri"),
        )
        .orderBy(F.desc("pri"), F.asc("doc_id"))
        .limit(100)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("pri"), F.asc("doc_id"))
    return ranked.select(
        "doc_id", "n_chars", "pri",
        F.row_number().over(w).cast("long").alias("rk"),
    )


_QUOTA_K = 10


def _quota_oracle() -> str:
    from data_pipeline_agent_spark.operators.text import EN_STOPWORDS

    stops = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
        WITH f AS (
          SELECT doc_id, source,
                 length(text) AS n_chars,
                 len({sql_tokens('text')}) AS n_tokens,
                 length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct,
                 len(list_filter({sql_tokens('text')},
                     x -> lower(x) IN ({stops}))) AS n_stop
          FROM documents
        ),
        qs AS (
          SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
                 round(least(n_tokens / 100.0, 1.0)
                       * (1.0 - abs(n_stop / greatest(n_tokens, 1) - 0.4)
                              - punct / greatest(n_chars, 1)), 6)
                   AS quality_score
          FROM f
        ),
        t AS (
          SELECT source, CAST(count(*) AS BIGINT) AS src_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS src_tokens
          FROM qs GROUP BY 1
        )
        SELECT q.source,
               CAST(row_number() OVER (
                   PARTITION BY q.source
                   ORDER BY q.quality_score DESC, q.doc_id
               ) AS BIGINT) AS rk,
               q.doc_id, q.quality_score, q.n_tokens,
               t.src_docs, t.src_tokens
        FROM qs q JOIN t ON q.source = t.source
        QUALIFY rk <= {_QUOTA_K}
    """


@register(
    "corpus_source_quota",
    oracle=_quota_oracle(),
    description=f"per-source quota curation (r11, the RefinedWeb/FineWeb "
    f"domain-cap pass): keep the top-{_QUOTA_K} documents per source by "
    "the composite quality score (rounded 6dp, doc_id tie-break — "
    "deterministic cross-engine ordering), carrying each source's total "
    "doc and token mass for the kept/dropped accounting; the "
    "source-partitioned rank compiles to a WindowGroupLimit (map-side "
    "top-k per partition BEFORE the shuffle — the plan gate asserts it), "
    "so a hot domain never funnels its full n/k rows through one reducer",
)
def corpus_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absolute per-domain caps are how production web corpora bound any
    single site's influence (RefinedWeb §'deduplication', FineWeb's url
    dedup + quota pass — public). Quota rank must be deterministic: the
    score is the 6dp-ROUNDED composite (ties broken by doc_id), so Spark
    and DuckDB order identically — an unrounded float order could flip
    on a ulp between engines. Totals ride a 20-row broadcast join, never
    a count(*) window (which would have no group limit and put n/k rows
    on a reducer)."""
    from pyspark.sql import Window

    from data_pipeline_agent_spark.operators.text import quality_score

    docs = table(spark, sf_dir, "documents")
    q = quality_score(docs, keep=("source",)).select(
        "doc_id", "source", "n_tokens", "quality_score"
    )
    totals = q.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("src_docs"),
        F.sum("n_tokens").cast("long").alias("src_tokens"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    kept = (
        q.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= _QUOTA_K)
    )
    return kept.join(F.broadcast(totals), "source").select(
        "source", "rk", "doc_id", "quality_score", "n_tokens",
        "src_docs", "src_tokens",
    )
