"""Tokenization + n-gram signature generation — portable Spark/DuckDB.

Reference parity:
  - tokenizeText  `/root/reference/src/md/MentionDetection.java:82-115`
    (char-scan splitter, lowercased). We tokenize *normalized* text, so a
    whitespace split is exact — the normalizer already mapped every
    delimiter to a space.
  - gatherNgrams  `/root/reference/src/md/MentionDetection.java:117-159`
    (all n-grams up to NGRAM_SIZE with a ring buffer). Re-expressed as an
    `explode` over a generated index sequence — no UDF, stays in codegen.

All builders assume the input column is already `normalize_text_col`
output (single-space separated, trimmed, lowercase).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(norm_col: Column) -> Column:
    """array<string> of tokens; empty array for empty text."""
    return F.filter(F.split(norm_col, " "), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), t -> t <> '')"


def _starts(n_slots: Column) -> Column:
    """sequence(1..n_slots) that is EMPTY when n_slots < 1. Spark's
    sequence(1, 0) silently reverses direction ([1, 0]) instead of being
    empty — the guard keeps parity with DuckDB's half-open range()."""
    return F.when(
        n_slots >= 1, F.sequence(F.lit(1), n_slots, F.lit(1))
    ).otherwise(F.array().cast("array<int>"))


def word_ngrams_col(tokens: Column, n: int) -> Column:
    """array<string> of space-joined word n-grams (empty if fewer than n
    tokens). Pure expression: slice over a generated start-index sequence."""
    starts = _starts((F.size(tokens) - (n - 1)).cast("int"))
    return F.transform(starts, lambda i: F.array_join(F.slice(tokens, i, n), " "))


def word_ngrams_sql(expr: str, n: int) -> str:
    return (
        f"list_transform(range(1, greatest(len({expr}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({expr}, i, i + {n - 1}), ' '))"
    )


def char_ngrams_col(norm_col: Column, n: int) -> Column:
    """array<string> of character n-gram shingles of the normalized text.
    Used by MinHash blocking; analog of the reference's n-gram dictionary
    probes (the reference used word n-grams against a mention dictionary;
    we have no dictionary, so char shingles give the same
    'shared-surface-form ⇒ same block' property)."""
    starts = _starts((F.length(norm_col) - (n - 1)).cast("int"))
    return F.transform(starts, lambda i: F.substring(norm_col, i, n))


def char_ngrams_sql(expr: str, n: int) -> str:
    return (
        f"list_transform(range(1, greatest(length({expr}) - {n - 1}, 0) + 1), "
        f"i -> substr({expr}, i, {n}))"
    )


# BPE-ish token counting regex: alpha runs, digit runs, single symbols.
# Same dialect subset works in Java regex (Spark) and RE2 (DuckDB).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_count_col(text_col: Column) -> Column:
    return F.regexp_count(text_col, F.lit(TOKEN_REGEX))


def regex_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_REGEX}'))"
