"""Oracle-checked text-analysis queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_agent_spark.operators import text as T
from data_pipeline_agent_spark.operators.text import BPE_REGEX, EN_STOPWORDS, LANG_MARKERS
from data_pipeline_agent_spark.plans.registry import register, table
from data_pipeline_agent_spark.plans.sql_text import sql_h32, sql_tokens


def _in_list(items: list[str]) -> str:
    return ", ".join(f"'{s}'" for s in items)


def _langid_case() -> str:
    clauses = ["WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'"]
    for lang, markers in LANG_MARKERS:
        clauses.append(
            f"WHEN len(list_filter(list_distinct({sql_tokens('lower(text)')}), "
            f"x -> x IN ({_in_list(markers)}))) >= 2 THEN '{lang}'"
        )
    return "CASE " + " ".join(clauses) + " ELSE 'unk' END"


@register(
    "text_language_id",
    oracle=f"SELECT doc_id, {_langid_case()} AS pred_lang FROM documents",
    description="rule-based language ID (CJK charset + marker stopwords)",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_id(table(spark, sf_dir, "documents"))


@register(
    "text_langid_confusion",
    oracle=f"""
        SELECT lang, {_langid_case()} AS pred_lang, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    """,
    description="language-ID confusion matrix vs the ground-truth lang column",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    # lang passes through language_id: no join back to the corpus
    return (
        T.language_id(docs, keep=("lang",))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "text_quality_score",
    oracle=f"""
        WITH f AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len({sql_tokens('text')}) AS n_tokens,
                 length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct,
                 len(list_filter({sql_tokens('text')},
                     x -> lower(x) IN ({_in_list(EN_STOPWORDS)}))) AS n_stop
          FROM documents
        )
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               round((n_chars - (n_tokens - 1)) / greatest(n_tokens, 1), 6) AS mean_token_len,
               round(punct / greatest(n_chars, 1), 6) AS punct_ratio,
               round(n_stop / greatest(n_tokens, 1), 6) AS stopword_ratio,
               round(least(n_tokens / 100.0, 1.0)
                     * (1.0 - abs(n_stop / greatest(n_tokens, 1) - 0.4)
                            - punct / greatest(n_chars, 1)), 6) AS quality_score
        FROM f
    """,
    description="quality features: length, punct ratio, stopword ratio, score",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_score(table(spark, sf_dir, "documents"))


@register(
    "text_token_counts",
    oracle=f"""
        SELECT doc_id,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS BIGINT) AS bpe_tokens
        FROM documents
    """,
    description="whitespace + BPE-ish pre-token counts",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_counts(table(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    oracle=f"""
        WITH b AS (
          SELECT doc_id,
                 array_to_string(list_sort(list_distinct({sql_tokens('text')})), ' ') AS bag
          FROM documents
        )
        SELECT doc_id, md5(bag) AS bag_md5, {sql_h32('bag')} AS bag_h32 FROM b
    """,
    description="order-insensitive bag-of-tokens md5 fingerprint",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(table(spark, sf_dir, "documents"))


@register(
    "text_tfidf_top_terms",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, unnest({sql_tokens('lower(text)')}) AS term FROM documents
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS nd FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 round(tf.tf * (ln((1.0 + nd) / (1.0 + dfc)) + 1.0), 6) AS tfidf
          FROM tf JOIN dfreq USING (term), n
        )
        SELECT doc_id, term, tfidf, CAST(rn AS BIGINT) AS rk
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY tfidf DESC, term ASC) AS rn FROM scored)
        WHERE rn <= 3
    """,
    description="smoothed TF-IDF top-3 terms per document (explode + two aggs + window)",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, n_docs=docs.count(), k=3)


@register(
    "text_wordcount_top100",
    oracle="""
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT lower(unnest(string_split(text, ' '))) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 100
    """,
    description="classic wordcount: explode split tokens, partial-agg combine, top-k",
)
def text_wordcount_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # explode is map-side; the only shuffle is the word-key partial agg, which
    # combines locally first — the canonical scale-out wordcount plan.
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(100)
    )
