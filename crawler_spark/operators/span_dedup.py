"""Repeated-span (ExactSubstr-style) detection over a document corpus.

Document-level exact dedup (operators/dedup_text.exact_dup_groups) misses the
dominant duplication mode in crawled corpora: long byte-identical RUNS inside
otherwise-distinct pages (boilerplate, quoted articles, licence blocks).  Lee
et al., "Deduplicating Training Data Makes Language Models Better" (ACL 2022)
remove every occurrence of any ≥50-token substring that appears twice in the
corpus, using a monolithic suffix array.  A suffix array does not distribute;
this module re-expresses the same semantics as DataFrame algebra:

1. slide a k-token window (stride 1) over each document's whitespace tokens
   and fingerprint it — ``md5`` over the window text, the repo's standard
   128-bit exactness proxy (same stance as ``exact_dup_groups``);
2. a window is *duplicated* iff its fingerprint occurs ≥2 times corpus-wide
   — ``COUNT(*) OVER (PARTITION BY window_hash)``, ONE shuffle keyed by the
   hash, no self-join, no pair blow-up (cost is linear in occurrences, not
   quadratic: a window repeated m times contributes m rows, not m²);
3. per document, merge overlapping/adjacent duplicated window starts into
   maximal spans with gaps-and-islands (lag + cumulative new-island flags),
   ONE shuffle keyed by the document id.

Any duplicated run of L ≥ k tokens is reported exactly as [its first token,
its last token]: all L-k+1 of its windows are duplicated and consecutive, so
the island closure recovers the maximal extent.

Scale story (100 TB): stride-1 windows mean O(total_tokens) shuffle rows of
(16 B hash, id, int) — window TEXT never transits a shuffle.  That is the
honest cost of exact detection (the paper pays 8 bytes/token of suffix array
on one machine, which does not exist at 100 TB).  For corpus scale the
``winnow=w`` mode applies Schleimer-Wilkerson-Aiken winnowing (SIGMOD 2003,
the MOSS fingerprinter): per document, keep only each w-window's rightmost-
minimal fingerprint before the global shuffle, cutting shuffled rows ~w/2×
while guaranteeing every duplicated run of ≥ w + k - 1 tokens is still hit
(the argmin of a hash window shared by two documents is the same relative
position in both).  Winnowed spans are detection regions, not exact bounds:
each reported span lies inside a true duplicated island (fingerprints are a
subset of duplicated windows — hypothesis-pinned), but its edges are the
outermost PAIRED fingerprints, which near run edges can sit several windows
inside the true extent; the guarantee is detection, not extent.  Islands
tolerate gaps ≤ w between kept fingerprints.

Reference tie-in: the reference stores whole pages (`Crawlers.java` rawdata
-> file sinks) with no corpus-level curation; this is curation-tier, part of
the LLM-pipeline surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["duplicated_spans", "remove_spans", "DEFAULT_K"]

DEFAULT_K = 8   # window length in tokens (the paper uses 50 BPE tokens at
#                 web scale; demo corpora here average ~56 tokens/doc)

# Window-text join separator for hashing.  Tokens come from a single-space
# split, so no token can contain a space: the space join is bijective and the
# hash keys exactly the token sequence.
_SEP = " "

_RESERVED = ("_tk", "_n", "_s", "_wh", "_c", "_g", "_fp")


def _check_reserved(df: DataFrame, extra: tuple[str, ...] = ()) -> None:
    hit = sorted((set(_RESERVED) | set(extra)) & set(df.columns))
    if hit:
        raise ValueError(f"input columns collide with scratch names: {hit}")


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    winnow: int | None = None,
) -> DataFrame:
    """One row per maximal duplicated token span.

    Output: ``(id_col, span_start, span_end, span_tokens, n_windows)`` —
    1-based inclusive token indices, ``n_windows`` = duplicated k-windows
    merged into the span.  Rows with NULL text or fewer than ``k`` tokens
    yield no spans (degradation, never an error).

    ``winnow=w`` (w ≥ 2) switches to fingerprint-sampled detection: spans
    are guaranteed to flag every duplicated run of ≥ w + k - 1 tokens
    (extents approximate, always inside the exact-mode island); shuffle
    volume drops ~w/2×.
    """
    if k < 2:
        raise ValueError("require k >= 2")
    if winnow is not None and winnow < 2:
        raise ValueError("require winnow >= 2 (or None for exact mode)")
    _check_reserved(df)

    toks = F.split(F.col(text_col), " ")
    wins = (
        df.select(F.col(id_col), toks.alias("_tk"))
        .where(F.col(text_col).isNotNull() & (F.size(toks) >= k))
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.size("_tk") - F.lit(k - 1))
            ).alias("_s"),
            F.col("_tk"),
        )
        .select(
            id_col,
            "_s",
            F.md5(F.concat_ws(_SEP, F.slice("_tk", F.col("_s"), k))).alias("_wh"),
        )
    )

    gap = 1  # exact mode: duplicated windows of one run are stride-1 adjacent
    if winnow is not None:
        # Rightmost-minimal fingerprint of every w-window of window-hashes.
        # The argmin depends only on hashes INSIDE the w-window, so two
        # documents sharing those k-grams select the same relative position
        # — the winnowing correctness argument (SIGMOD'03 §4).  struct
        # ordering (hash ASC, -_s ASC) makes ties rightmost deterministically.
        w_sel = (
            Window.partitionBy(id_col)
            .orderBy("_s")
            .rowsBetween(Window.currentRow, winnow - 1)
        )
        wins = (
            wins.withColumn(
                "_fp",
                F.min(
                    F.struct(F.col("_wh").alias("h"), (-F.col("_s")).alias("ns"))
                ).over(w_sel),
            )
            .select(
                id_col,
                (-F.col("_fp.ns")).alias("_s"),
                F.col("_fp.h").alias("_wh"),
            )
            .distinct()
        )
        gap = winnow  # kept fingerprints of one run are ≤ w apart

    dup = (
        wins.withColumn("_c", F.count("*").over(Window.partitionBy("_wh")))
        .where(F.col("_c") >= 2)
        .select(id_col, "_s")
    )

    # Gaps-and-islands with tolerance: a new island starts where the jump
    # from the previous kept start exceeds ``gap`` (first row: NULL compare
    # → otherwise-0, island ids are 0-based cumulative sums).
    w_doc = Window.partitionBy(id_col).orderBy("_s")
    isl = dup.withColumn(
        "_g",
        F.sum(
            F.when(F.col("_s") - F.lag("_s").over(w_doc) > gap, 1).otherwise(0)
        ).over(w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        isl.groupBy(id_col, "_g")
        .agg(
            F.min("_s").alias("span_start"),
            (F.max("_s") + F.lit(k - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every token covered by a span; all other columns pass through.

    Adds ``clean_text`` (space-joined survivors) and ``removed_tokens``.
    Matches the paper's tool, which removes EVERY occurrence of a duplicated
    substring (both copies), accepting that a string may vanish entirely.

    Plan: spans fold to one ``array<struct>`` per document (bounded by
    tokens/k entries), ONE equi-join back on the id, then a higher-order
    ``F.filter`` indexes each token against the span list — no explode of
    the token column, no shuffle of token text beyond the join.
    """
    _check_reserved(df, ("_spans", "clean_text", "removed_tokens"))
    packed = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.split(F.col(text_col), " ")
    keep = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"),
            lambda sp: (i + 1 >= sp["span_start"]) & (i + 1 <= sp["span_end"]),
        ),
    )
    untouched = F.col(text_col).isNull() | F.col("_spans").isNull()
    return (
        df.join(packed, id_col, "left")
        .withColumn(
            "clean_text",
            F.when(untouched, F.col(text_col)).otherwise(F.concat_ws(" ", keep)),
        )
        .withColumn(
            "removed_tokens",
            F.when(untouched, F.lit(0)).otherwise(F.size(toks) - F.size(keep)),
        )
        .drop("_spans")
    )
