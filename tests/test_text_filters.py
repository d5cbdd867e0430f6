"""Gopher quality / repetition / PII operators on crafted fixtures —
content the synthetic corpus may not exercise (bullets, ellipses, emails,
URLs, duplicate lines)."""

from pyspark.sql import functions as F

from data_pipeline_agent_spark.operators.text import (
    gopher_quality_flags,
    pii_redact,
    repetition_stats,
)


def test_gopher_flags_fixture(spark):
    good = "the quick brown fox jumps over a lazy dog and " * 10  # 100 words, stopwords
    bullets = "\n".join("- item " + str(i) for i in range(10))
    symbols = "# " * 60
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert rows[1]["gopher_pass"] is True
    assert rows[1]["word_count"] == 100
    assert rows[1]["stopword_hits"] >= 2
    assert rows[2]["bullet_line_frac"] == 1.0 and rows[2]["gopher_pass"] is False
    assert rows[3]["symbol_word_ratio"] >= 0.5 and rows[3]["gopher_pass"] is False


def test_repetition_stats_fixture(spark):
    text = "copy me\ncopy me\ncopy me\nunique line"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert r["n_lines"] == 4
    # 4 lines, 2 distinct -> 2/4 duplicated
    assert r["dup_line_frac"] == 0.5
    # repeats beyond first: 2 x len("copy me")=7 -> 14 / (3*7 + 11) = 14/32
    assert r["dup_line_char_frac"] == round(14 / 32, 6)
    assert r["top_2gram"] == "copy me"
    assert r["top_2gram_count"] == 3


def test_pii_redact_fixture(spark):
    text = (
        "mail a@b.com or visit https://x.io/a?b=1 from 10.0.0.1 "
        "call +14155550123 end"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = pii_redact(df).collect()[0]
    assert r["n_url"] == 1 and r["n_email"] == 1 and r["n_ipv4"] == 1 and r["n_phone"] == 1
    assert "<URL>" in r["redacted"] and "<EMAIL>" in r["redacted"]
    assert "a@b.com" not in r["redacted"] and "10.0.0.1" not in r["redacted"]
    assert "+14155550123" not in r["redacted"]
    # an email inside a URL is a URL, not an email
    df2 = spark.createDataFrame(
        [(2, "see https://x.io/u@v.com only")], "doc_id long, text string"
    )
    r2 = pii_redact(df2).collect()[0]
    assert r2["n_url"] == 1 and r2["n_email"] == 0
