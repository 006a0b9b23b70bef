"""Token-window document chunking — the map from curated documents to
training examples (fixed context windows with overlap, the standard
pack-and-chunk step before tokenizer sharding).

Plan shape (scale story): tokens = ``split`` (JVM), chunk starts =
``sequence(1, n_tokens, stride)`` exploded — a per-row flatMap with NO
shuffle; each chunk's text is re-assembled with ``concat_ws(slice(...))``
and fingerprinted with portable md5.  Output size is input_tokens/stride
rows; downstream chunk-level exact dedup is one groupBy on the 128-bit
hash — the same single-shuffle shape as document-level exact dedup
(operators/dedup_text.exact_dup_groups).

Everything is whole-stage-codegen'd Column algebra; no Python, no UDF.

Reference tie-in: the reference stores whole pages (`Crawlers.java` rawdata
→ file sinks); chunking is the curation-tier continuation this engine adds
for LLM-corpus use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "token_blocks", "DEFAULT_WINDOW", "DEFAULT_STRIDE"]

DEFAULT_WINDOW = 32  # tokens per chunk
DEFAULT_STRIDE = 24  # tokens between chunk starts (overlap = window - stride)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
) -> DataFrame:
    """Explode each document into overlapping whitespace-token windows.

    Adds columns (all other input columns pass through):

    * ``chunk_start`` — 1-based token index of the window start
    * ``chunk_tokens`` — tokens in this window (= ``window`` except the tail)
    * ``chunk_hash`` — md5 of the window text (portable, dedup-ready)

    A document with ``n`` tokens yields ``ceil(n / stride)`` chunks (starts
    at 1, 1+stride, …, ≤ n) — every token lands in ≥1 chunk, consecutive
    chunks overlap by ``window - stride`` tokens.
    """
    if not (0 < stride <= window):
        raise ValueError("require 0 < stride <= window")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    out = (
        df.withColumn("_tk", toks)
        .withColumn("_n", n)
        .withColumn("chunk_start", F.explode(F.sequence(F.lit(1), F.col("_n"), F.lit(stride))))
    )
    remaining = F.col("_n") - F.col("chunk_start") + F.lit(1)
    chunk_text = F.concat_ws(
        " ", F.slice(F.col("_tk"), F.col("chunk_start"), F.least(F.lit(window), remaining))
    )
    return (
        out.withColumn("chunk_tokens", F.least(F.lit(window), remaining))
        .withColumn("chunk_hash", F.md5(chunk_text))
        .drop("_tk", "_n")
    )


def token_blocks(
    docs: DataFrame, block_size: int,
    id_col: str = "doc_id", tokens_col: str = "n_tokens",
) -> DataFrame:
    """GPT-style sample packing: concatenate documents in a deterministic
    seed-free global order (md5 of the id — the same reproducible-shuffle
    convention as the training-shard layout) and split the resulting token
    stream into fixed ``block_size`` blocks, documents straddling block
    boundaries (the standard pretraining pack: no padding, no document
    alignment — Brown et al. 2020 §2.1 describe exactly this layout).

    Input: one row per doc with an integral ``tokens_col``.  Output: one
    row per (block, doc) incidence — ``block_id``, the doc id, and the
    in-doc token span [``tok_start``, ``tok_end``) that lands in the block;
    a doc spanning k blocks yields k rows, so rows out = n_docs +
    total_tokens/block_size extra boundary rows (linear).  Every block
    except the last holds exactly ``block_size`` tokens by construction.

    Plan shape: ONE range shuffle (the scale-safe global prefix sum over
    the order key), then a shuffle-free explode of per-doc block spans —
    no join, no window over a single partition.  Contrast
    ``chunk_documents`` (per-doc overlapping windows, doc-aligned): packing
    is the corpus-level layout, chunking the doc-level one.
    """
    from crawler_spark.operators.ordering import global_prefix_sum

    d = docs.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("_n"),
        F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))).alias("_ord"),
    ).filter(F.col("_n") > 0)
    c = global_prefix_sum(d, ["_ord", id_col], "_n", sum_col="_end")
    c = c.withColumn("_start", F.col("_end") - F.col("_n"))
    b = c.withColumn(
        "block_id",
        F.explode(
            F.sequence(
                F.expr(f"_start DIV {block_size}"),
                F.expr(f"(_end - 1) DIV {block_size}"),
            )
        ),
    )
    bs = F.lit(int(block_size)).cast("long")
    blk_lo = F.col("block_id") * bs
    return b.select(
        "block_id",
        F.col(id_col),
        (F.greatest(blk_lo, F.col("_start")) - F.col("_start")).alias("tok_start"),
        (F.least(blk_lo + bs, F.col("_end")) - F.col("_start")).alias("tok_end"),
    )
