"""Shared text-analysis column expressions (pure Spark SQL expressions —
JVM-side, codegen'd; no Python UDFs in any hot path).

Cross-engine determinism rule: every hash is md5 (identical hex output in
Spark and DuckDB), every tokenization is a plain ``\\s+`` split, so each
operator's DuckDB oracle can reproduce values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark SQL expression for whitespace tokens of lower-cased text.
TOKENS_SQL = "split(lower(text), '\\\\s+')"
# DuckDB twin
TOKENS_DUCK = "string_split_regex(lower(text), '\\s+')"

STOPWORDS = ["the", "a", "an", "of", "and", "or", "to", "in", "is", "it"]


def tokens() -> Column:
    return F.expr(TOKENS_SQL)


def shingles_sql(n: int = 3) -> str:
    """Spark SQL expr: word n-gram shingles of `toks` (an array column)."""
    parts = ", ".join(f"element_at(toks, i + {k})" for k in range(n))
    return f"transform(sequence(1, size(toks) - {n - 1}), i -> concat_ws(' ', {parts}))"


def shingles_duck(n: int = 3) -> str:
    """DuckDB twin of shingles_sql over a list column `toks` (1-indexed)."""
    parts = " || ' ' || ".join(f"toks[i + {k}]" for k in range(n))
    return f"list_transform(range(1, len(toks) - {n - 2}), i -> {parts})"
