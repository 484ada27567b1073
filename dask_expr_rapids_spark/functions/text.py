"""Text-analysis column functions for LLM-data pipelines.

All pure ``pyspark.sql.functions`` compositions — JVM-side, whole-stage
codegen'd, no Python in the hot path.  Each has an exact ANSI-SQL twin used
by the DuckDB oracle (see ``dask_expr_rapids_spark.queries.text``).

These extend the reference surface (it has only a pandas str accessor,
``/root/reference/dask_expr/_str_accessor.py``) with the operations a
100 TB training-data pipeline needs: token counting, quality scoring,
language ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small high-frequency English stopword set used by the n-gram-free
#: language-ID heuristic.  Deliberately tiny + fixed so the oracle SQL can
#: inline the same list.
EN_STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was")


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string>; empty string → empty array."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col)))


def word_chars(col: Column) -> Column:
    """Count of alphabetic characters."""
    return F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))


def punct_chars(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^.,;:!?'\"()-]", ""))


def stopword_hits(col: Column) -> Column:
    """Number of tokens that are one of :data:`EN_STOPWORDS` (lowercased)."""
    toks = tokens(F.lower(col))
    return F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))


def english_score(col: Column) -> Column:
    """Stopword-ratio language-ID heuristic: fraction of tokens that are
    common English stopwords.  >~0.08 is a strong English signal."""
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_hits(col).cast("double") / n.cast("double")
    )


def quality_score(col: Column) -> Column:
    """Cheap doc-quality heuristic in [0,1]: rewards alphabetic density and
    moderate length, penalizes punctuation spam.  Deterministic arithmetic
    over counts, so the oracle can reproduce it exactly."""
    from .exact import pround

    length = F.length(col).cast("double")
    alpha_ratio = F.when(length == 0, F.lit(0.0)).otherwise(word_chars(col) / length)
    punct_ratio = F.when(length == 0, F.lit(0.0)).otherwise(punct_chars(col) / length)
    len_factor = F.least(length / F.lit(500.0), F.lit(1.0))
    return pround(
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(1.0), alpha_ratio * F.lit(0.7) + len_factor * F.lit(0.3) - punct_ratio),
        ),
        6,
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: MD5 of the normalized text (lowercased,
    whitespace collapsed).  MD5 is identical across engines, making this the
    exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Array of character n-grams (shingles) of the normalized text.
    Built with ``sequence`` + ``transform`` — pure codegen, no UDF."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    length = F.length(normalized)
    return F.when(length < n, F.array(normalized)).otherwise(
        F.transform(
            F.sequence(F.lit(1), length - (n - 1)),
            lambda i: normalized.substr(i, F.lit(n)),
        )
    )
