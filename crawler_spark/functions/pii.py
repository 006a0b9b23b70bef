"""PII scrubbing over text columns — a standard pre-training curation pass
(emails, E.164-ish phone numbers, IPv4 literals are redacted before a corpus
ships; cf. the C4/Dolma cleanup recipes).

Everything here is a pure JVM-side Column expression (``regexp_replace`` /
``regexp_extract_all``) — no Python in the hot path, whole-stage codegen
keeps the scan fused, and the pass is embarrassingly parallel (per-row map,
zero shuffle) at any scale.

Oracle portability: the patterns use only the regex subset that Java
(Spark) and RE2 (DuckDB) evaluate identically — character classes, bounded
quantifiers, literal dots inside classes; no lookaround, no backreferences.
Counting happens SEQUENTIALLY on progressively-scrubbed text (emails first,
then phones, then IPv4s) so an overlap such as a ``+`` phone-like run inside
an email local part is never double-counted, in either engine.

Reference tie-in: the reference crawler exports raw extracted text verbatim
(`PlainTextFileStorer.java`); a scrub pass is the curation-tier counterpart
this engine adds for LLM-corpus use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: scrub emails first (their local parts can embed phone-like runs),
# then phones, then bare IPv4 literals.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+[0-9]{8,15}", "[PHONE]"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
]


def scrub_pii(col: Column) -> Column:
    """Redact all PII pattern classes, applied in the canonical order."""
    out = col
    for _name, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: Column) -> list[tuple[str, Column]]:
    """(kind, count-Column) per pattern, counted on sequentially-scrubbed
    text so overlapping classes are attributed once, to the earliest class."""
    out = []
    cur = col
    for name, pat, token in PII_PATTERNS:
        out.append((name, F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))))
        cur = F.regexp_replace(cur, pat, token)
    return out
