"""Corpus-curation operators: benchmark decontamination, deterministic
source mixing, unigram-frequency quality scoring (§2.10 LLM-pipeline rows).

No reference analog (totyumengr/crawler stops at fetch+extract); these are
the steps a training-data pipeline runs over the crawled corpus before
tokenization.  All outputs are integer tallies or single-division doubles so
the DuckDB oracle value-hash is exact (see queries.py conventions).

Scale shapes:

* decontamination — the eval/benchmark side is small by construction
  (benchmarks are MBs; the corpus is TBs), so its distinct n-gram-hash set
  broadcasts and the contaminated-doc test is a broadcast LEFT SEMI join
  against the exploded training-gram table: linear scan, no shuffle of the
  big side beyond the final per-doc distinct.
* source mixing — pure map (md5-hash routing per row) + one partial-agg
  groupBy; reproducible across engines, runs and cluster sizes because the
  keep decision is a pure function of (doc_id, source), never an RNG.
* unigram stats — one combiner-friendly groupBy builds the corpus vocab,
  one hash join scores occurrences; at 100 TB prune the vocab table to
  count ≥ 2 before the join (hapax legomena dominate vocab size but a
  missing join hit IS the rare signal, kept here via a left join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_hash_table", "decontaminate_stats"]


def ngram_hash_table(docs: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """(doc_id, h) — md5 of each distinct word ``n``-gram of each doc.

    Same tokenize-once / index-by-position shape as dedup_text.shingle_table
    (O(tokens) per doc); distinct within doc before exploding so a gram
    repeated inside one doc costs one row.
    """
    toks = docs.select("doc_id", F.split(text_col, " ").alias("w"))
    sz = F.size("w")
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.md5(
                F.concat_ws(" ", *[F.element_at("w", (i + j).cast("int")) for j in range(n)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("doc_id", F.explode(F.array_distinct(grams)).alias("h"))


def decontaminate_stats(
    docs: DataFrame, n: int = 5, eval_mod: int = 97, id_col: str = "doc_id"
) -> DataFrame:
    """Per-source decontamination tally: training docs sharing any word
    ``n``-gram with the held-out eval slice (``doc_id % eval_mod == 0``).

    The n-gram-overlap rule is the standard published decontamination
    criterion (GPT-3 appendix C / the Pile): an eval n-gram appearing
    verbatim in a training doc marks that doc contaminated.  Output:
    (source, n_train, n_contaminated) — integer-exact.
    """
    is_eval = F.col(id_col) % eval_mod == 0
    grams = ngram_hash_table(docs, n=n)
    eval_grams = (
        grams.join(docs.filter(is_eval).select(id_col), id_col).select("h").distinct()
    )
    contaminated = (
        grams.join(docs.filter(~is_eval).select(id_col), id_col)
        .join(F.broadcast(eval_grams), "h", "left_semi")
        .select(id_col)
        .distinct()
    )
    train = docs.filter(~is_eval).select(id_col, "source")
    return (
        train.join(contaminated.withColumn("is_cont", F.lit(1)), id_col, "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.coalesce(F.col("is_cont"), F.lit(0))).alias("n_contaminated"),
        )
        .orderBy("source")
    )
