"""DuckDB SQL fragment generators mirroring functions/text_hash.py.

The oracle twins for the dedup queries need the exact same shingling and
hashing arithmetic as the Spark side. These helpers emit the SQL text;
constants are imported from text_hash so the two sides cannot drift.
"""

from __future__ import annotations

from data_pipeline_agent_spark.functions.text_hash import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
    NGRAM_N,
    SIMHASH_BITS,
)

HEX = "0123456789abcdef"


def sql_h32(expr: str) -> str:
    """int(md5(expr)[0:8], 16) without a hex-parse builtin: positional
    strpos arithmetic over the 8 hex chars."""
    terms = [
        f"(strpos('{HEX}', substr(md5({expr}), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def sql_tokens(expr: str) -> str:
    return f"string_split_regex(trim({expr}), '\\s+')"


def sql_ngrams(toks: str, n: int = NGRAM_N) -> str:
    """Distinct word n-grams of a token list (empty when len < n)."""
    concat = " || ' ' || ".join(f"{toks}[i + {off}]" for off in range(n))
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), i -> {concat}) "
        f"ELSE [] END)"
    )


def sql_minhash(grams: str, j: int) -> str:
    return (
        f"list_aggregate(list_transform({grams}, g -> "
        f"({MINHASH_A[j]} * {sql_h32('g')} + {MINHASH_B[j]}) % {MINHASH_PRIME}), 'min')"
    )


def sql_simhash32(grams_exploded_hash: str = "h") -> str:
    """SimHash aggregation over an exploded (doc_id, h) relation: emits the
    SELECT-list fragment turning 32 per-bit vote sums into the fingerprint.
    Use as: SELECT doc_id, {sql_simhash32()} FROM ... GROUP BY doc_id."""
    parts = [
        f"CASE WHEN sum((({grams_exploded_hash} >> {k}) & 1) * 2 - 1) > 0 "
        f"THEN {1 << k} ELSE 0 END"
        for k in range(SIMHASH_BITS)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
