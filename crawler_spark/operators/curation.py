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

__all__ = [
    "ngram_hash_table",
    "decontaminate_stats",
    "hashed_gram_counts",
    "dsir_bucket_logratios",
    "dsir_scores",
]


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


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169):
# select raw-pool documents whose hashed bag-of-ngram features look like a
# small curated target corpus.  Feature space = word uni+bigrams hashed into
# m buckets (the paper's §3 "hashed n-gram features"); the importance weight
# of a doc is sum_b count_b * log(p_b / q_b) with p fit on the target and q
# on the raw pool, add-1 smoothed over the m-bucket domain.
#
# Engine-exactness: per-bucket log-ratios are SCALED INTEGERS
# (round(ln(ratio) * 1e6) as BIGINT — the house PageRank/HLL discipline), so
# the per-doc weight is an integer SUM whose value is independent of
# accumulation order; a float sum over buckets would hash differently across
# engines.  The ratio itself is one double division of two exactly-
# representable BIGINT products (< 2^53 up to ~10^7-gram corpora per side;
# beyond that compute ln(num) - ln(den) in log space).
#
# Scale shapes: gram counts are one map-side-combinable groupBy(doc, bucket);
# the bucket table is m rows (broadcast); target totals are two driver
# scalars (bounded-small, the q61 idiom — a crossJoin would plan the BNLJ
# node the registry-wide plan gate forbids); scoring is one broadcast join +
# one groupBy(doc).  Nothing in the lineage holds more than O(m) state
# outside the corpus-linear passes.
# ---------------------------------------------------------------------------


def hashed_gram_counts(
    docs: DataFrame, m: int = 4096, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, b, c) — per-doc counts of word uni+bigrams hashed into ``m``
    buckets (b = first 32 md5 bits mod m, the cross-engine hash idiom).

    Tokenize-once like ngram_hash_table; counts (not distinct) because DSIR's
    bag-of-words model weighs repeated grams.  NULL text degrades to the
    single empty-string token on both engines (coalesce mirrors DuckDB's
    ``string_split(coalesce(text,''), ' ')``)."""
    toks = docs.select(
        id_col, F.split(F.coalesce(text_col, F.lit("")), " ").alias("w")
    )
    sz = F.size("w")
    bis = F.when(
        sz >= 2,
        F.transform(
            F.sequence(F.lit(1), sz - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at("w", i.cast("int")),
                F.element_at("w", (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = toks.select(id_col, F.explode(F.concat("w", bis)).alias("g"))
    b = F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long") % m
    return (
        g.select(id_col, b.alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count("*").cast("long").alias("c"))
    )


def dsir_bucket_logratios(
    counts: DataFrame,
    target_ids: DataFrame,
    id_col: str = "doc_id",
    m: int = 4096,
    scale: int = 1_000_000,
) -> DataFrame:
    """(b, slr) — scaled-integer log importance ratio per hash bucket:
    ``slr = round(ln((tc+1)(r_tot+m) / ((rc+1)(t_tot+m))) * scale)``.

    ``counts`` is ``hashed_gram_counts`` output over the WHOLE corpus;
    ``target_ids`` (one column, ``id_col``) names the curated target docs —
    small by construction (the DSIR target is Wikipedia-sized while the raw
    pool is crawl-sized), hence broadcast.  Buckets absent from one side get
    the add-1 smoothing floor via the full-outer coalesce."""
    tb = (
        counts.join(F.broadcast(target_ids), id_col, "left_semi")
        .groupBy("b")
        .agg(F.sum("c").alias("tc"))
        .localCheckpoint(eager=True)
    )
    rb = (
        counts.join(F.broadcast(target_ids), id_col, "left_anti")
        .groupBy("b")
        .agg(F.sum("c").alias("rc"))
        .localCheckpoint(eager=True)
    )
    t_tot = int(tb.agg(F.sum("tc")).first()[0] or 0)
    r_tot = int(rb.agg(F.sum("rc")).first()[0] or 0)
    num = (F.coalesce("tc", F.lit(0)) + 1) * F.lit(r_tot + m)
    den = (F.coalesce("rc", F.lit(0)) + 1) * F.lit(t_tot + m)
    slr = F.round(
        F.log(num.cast("double") / den.cast("double")) * scale
    ).cast("long")
    return tb.join(rb, "b", "full").select("b", slr.alias("slr"))


def dsir_scores(
    counts: DataFrame, ratios: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, dsir_score) — integer importance weight per doc: the bucket-count
    dot product with the scaled log-ratio table (broadcast: ``ratios`` is at
    most m rows).  Positive score = doc looks more target- than raw-like."""
    return (
        counts.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("slr")).cast("long").alias("dsir_score"))
    )
