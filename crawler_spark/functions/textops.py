"""Text-analysis functions for large-scale training-data pipelines.

All JVM-side (built-in pyspark.sql.functions / higher-order lambdas — no
Python UDFs in these hot paths): tokenization, quality scoring, stopword
ratios, n-gram shingling, document fingerprints, and a character-class
language heuristic.  Each has an ANSI-SQL twin in crawler_spark.queries for
the DuckDB oracle.

No reference analog (the reference crawler is transport-only; text handling
there is Jsoup cleanup, reference PureTextFileTaskResultExporter.java:28-38,
covered by html_to_text below) — these are the north-rule "training-data
pipeline" additions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_token_count",
    "stopword_ratio",
    "word_shingles",
    "fingerprint",
    "quality_flags",
    "lang_guess",
    "html_to_text_udf",
]

DEFAULT_STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on single spaces; JVM-side)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Subword-style token count: letter runs, digit runs, and single
    punctuation each count as one token (a BPE-ish regex segmentation;
    JVM-side regexp, no Python).  DuckDB twin: the same RE2 pattern under
    ``regexp_extract_all``."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), F.lit(0)))


def stopword_ratio(text: Column, stopwords: tuple = DEFAULT_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords — a quality-score component."""
    toks = tokens(text)
    stops = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return stops.cast("double") / F.size(toks).cast("double")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles via higher-order functions (no UDF).

    Caller must guarantee ≥ n tokens (Spark's ``sequence(1, k)`` produces a
    DESCENDING range when k < 1 — filter short docs first).
    """
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )


def fingerprint(text: Column, bits_hex: int = 16) -> Column:
    """Deterministic document fingerprint: truncated md5 (portable to any
    ANSI engine, unlike xxhash64)."""
    return F.substring(F.md5(text), 1, bits_hex)


def quality_flags(text: Column, min_tokens: int = 20, max_tokens: int = 100_000,
                  max_stop_ratio: float = 0.5) -> Column:
    """Boolean quality gate: length band + stopword-ratio ceiling."""
    n = token_count(text)
    return (
        (n >= min_tokens) & (n <= max_tokens) & (stopword_ratio(text) < max_stop_ratio)
    )


def lang_guess(text: Column) -> Column:
    """Character-class language heuristic (n-gram-free, JVM-side regex).

    ascii-dominant → 'en'-ish latin; CJK codepoints → 'zh'; cyrillic → 'ru';
    else 'other'.  A placeholder for a real n-gram model — deliberately
    simple + deterministic so the oracle can mirror it.
    """
    cjk = F.regexp_count(text, F.lit(r"[一-鿿]"))
    cyr = F.regexp_count(text, F.lit(r"[Ѐ-ӿ]"))
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(cyr > 0, F.lit("ru"))
        .otherwise(F.lit("latin"))
    )


def html_to_text_udf():
    """HTML → pure text (F10, reference
    PureTextFileTaskResultExporter.java:28-38: Jsoup.clean with
    Whitelist.none() == strip all tags, keep text).

    Thin vectorized wrapper over the canonical scalar
    ``operators.exporters.strip_tags_line`` — the K2 pure-text sink and this
    column function share ONE implementation, pinned by the reference's own
    test vectors (tests/test_exporters.py).
    """
    from pyspark.sql.functions import pandas_udf

    def _f(s):
        import pandas as pd

        from crawler_spark.operators.exporters import strip_tags_line

        return pd.Series(
            [strip_tags_line(x) if isinstance(x, str) else None for x in s],
            dtype="object",
        )

    return pandas_udf(_f, "string")
