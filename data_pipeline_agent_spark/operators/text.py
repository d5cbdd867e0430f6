"""Text-analysis operators over a (id, text) corpus: language ID, quality
scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, codegen'd — no Python UDFs in the
hot path), each with a DuckDB-expressible twin for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_agent_spark.functions.text_hash import h32, tokens

# rule-based language ID: ordered (lang, marker-words) table; CJK charset
# first, then stopword hits, default 'en'-vs-'unk' by latin-letter share
LANG_MARKERS = [
    ("de", ["der", "die", "das", "und", "ist", "nicht"]),
    ("fr", ["le", "les", "une", "est", "et", "dans"]),
    ("es", ["el", "los", "una", "es", "y", "que"]),
    ("en", ["the", "a", "is", "and", "of", "to"]),
]

EN_STOPWORDS = [
    "the", "a", "an", "is", "are", "and", "or", "of", "to", "in", "on", "it",
    "this", "that", "for", "with", "as", "at", "by",
]

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-alnum marks
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _marker_hits(dtoks: Column, markers: list[str]) -> Column:
    """Marker hits over an already-distinct token array."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(dtoks, arr))


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic rule-based language ID: CJK charset -> zh, else the
    marker-word table in order, else 'unk'. (On natural text the marker
    lists dominate; on this synthetic corpus it demonstrates the plumbing.)

    The distinct-token array is staged as its own projection attribute:
    the marker predicate references it once per language, and each
    reference would otherwise embed its own copy of the tokenize+distinct
    subtree (no subexpression elimination across those copies).

    ``keep`` passes source columns through (e.g. a ground-truth label) so
    downstream consumers don't need a join back to the corpus."""
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.col(text_col).alias("__t"),
        F.array_distinct(tokens(F.lower(F.col(text_col)))).alias("__dtoks"),
    )
    pred = F.when(F.col("__t").rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
    for lang, markers in LANG_MARKERS:
        pred = pred.when(_marker_hits(F.col("__dtoks"), markers) >= 2, F.lit(lang))
    pred = pred.otherwise(F.lit("unk"))
    return staged.select(F.col(id_col), *[F.col(c) for c in keep], pred.alias("pred_lang"))


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score:
    n_chars, n_tokens, mean token length, punctuation ratio, stopword
    ratio; score = stopword_ratio-centered minus punctuation penalty,
    scaled by a length prior. All ratios rounded to 6."""
    staged = df.select("*", tokens(F.col(text_col)).alias("__toks"))
    t = F.col(text_col)
    toks = F.col("__toks")  # staged: tokenization runs once per row
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(t, "[^.!?,;:]", ""))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    mean_tok_len = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    length_prior = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    score = length_prior * (F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)) - punct_ratio)
    return staged.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish pre-token count (letter runs,
    digit runs, punctuation marks)."""
    t = F.col(text_col)
    ws = F.size(tokens(t))
    # F.lit keeps the regex out of SQL-literal escaping (where \s would
    # collapse to s and the class would match whitespace)
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_REGEX), F.lit(0)))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token bag (hex string + 32-bit int form). Robust to token reordering —
    catches shuffled near-copies that exact dedup misses."""
    staged = df.select(
        F.col(id_col),
        F.array_join(F.array_sort(F.array_distinct(tokens(F.col(text_col)))), " ").alias("__bag"),
    )  # staged: the sort+distinct+join runs once, not once per hash below
    bag = F.col("__bag")
    return staged.select(
        F.col(id_col),
        F.md5(bag).alias("bag_md5"),
        h32(bag).alias("bag_h32"),
    )


def tfidf_top_terms(
    df: DataFrame,
    n_docs: int,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (tf * (ln((1+N)/(1+df)) + 1), sklearn's smooth_idf form).

    Pure DataFrame plan: explode -> tf agg (one shuffle on doc+term) ->
    document-frequency agg (one shuffle on term) -> join back on term ->
    per-doc window top-k. ``n_docs`` is a driver scalar (count once,
    reuse). MLlib's HashingTF/IDF is the stock alternative; exact terms
    keep the result oracle-checkable and human-readable."""
    from pyspark.sql import Window

    t = df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
    tf = t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        F.round(
            F.col("tf") * (F.log((1.0 + n_docs) / (1.0 + F.col("dfc"))) + 1.0), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select(id_col, "term", "tfidf", "rk")
    )
