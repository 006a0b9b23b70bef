"""Document-level deduplication operators for training-data pipelines.

Four scale-tested strategies over a ``(doc_id, text)`` table, all expressed
as DataFrame plans (shuffle-aware, no driver collects):

* exact          — md5-keyed groupBy (one shuffle on the 128-bit key)
* minhash + LSH  — word-shingles → k lexicographic-min md5 signatures →
                   banded keys → equi-self-join per band (candidate pairs
                   only where a band collides; the classic MinHash/LSH
                   banding scheme from Broder '97 / MMDS ch.3)
* n-gram Jaccard — exact Jaccard over shingle sets for candidate pairs
                   (verification stage after LSH)
* simhash        — 64-bit Charikar simhash over token md5s; near-dup =
                   hamming distance ≤ t via band-rotate joins

Portability note: hashes are md5-derived (not xxhash64) so every stage has
an exact ANSI-SQL twin for the DuckDB oracle (crawler_spark/queries.py).

At 100 TB: the banded self-join shuffles only (band_key, doc_id) pairs —
signatures are tiny (k×32 bytes); candidate verification joins back to
shingle sets by doc_id. Hot band keys (boilerplate docs) are the skew risk:
cap candidates per band via a window rank before the pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textops import word_shingles

__all__ = [
    "exact_dup_stats",
    "minhash_signature",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_near_pairs",
]


def exact_dup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row summary: total rows, unique texts (md5-keyed), dupes."""
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_unique"),
        (F.count("*") - F.countDistinct(F.md5(F.col(text_col)))).alias("n_dupes"),
    )


def _min_tokens_filter(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    return docs.filter(F.size(F.split(F.col(text_col), " ")) >= n)


def minhash_signature(
    docs: DataFrame, text_col: str = "text", k: int = 6, shingle_n: int = 3
) -> DataFrame:
    """(doc_id, sig:array<string>) — k minhashes as lexicographic-min md5s.

    min(md5(j || ':' || shingle)) over the shingle set is a valid minwise
    hash family (each j keys an independent permutation approximation) and
    is string-only, hence oracle-portable.
    """
    filtered = _min_tokens_filter(docs, text_col, shingle_n)
    sh = filtered.select("doc_id", word_shingles(F.col(text_col), shingle_n).alias("shingles"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(F.concat(j.cast("string"), F.lit(":"), s)),
            )
        ),
    )
    return sh.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 6,
    bands: int = 3,
    shingle_n: int = 3,
    max_band_size: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs (doc_a < doc_b) via banded minhash LSH.

    rows_per_band = k // bands; a pair collides iff some band's rows are all
    equal — banding trades precision for recall as usual.  ``max_band_size``
    caps pair blowup from degenerate hot bands (skew guard at scale).
    """
    r = k // bands
    sig = minhash_signature(docs, text_col, k, shingle_n)
    exploded = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"),
        F.col("sig"),
    ).select(
        "doc_id",
        "b",
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.element_at(F.col("sig"), (F.col("b") * r + F.lit(i)).cast("int"))
                    for i in range(1, r + 1)
                ],
            )
        ).alias("band_key"),
    )
    if max_band_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("b", "band_key").orderBy("doc_id")
        exploded = exploded.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= max_band_size
        ).drop("_rn")
    a, c = exploded.alias("a"), exploded.alias("c")
    return (
        a.join(
            c,
            (F.col("a.band_key") == F.col("c.band_key"))
            & (F.col("a.b") == F.col("c.b"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification stage).

    Joins each side's shingle set by doc_id; Jaccard via array_intersect /
    array_union on deduped shingle arrays — JVM-side, no UDF.
    """
    sh = _min_tokens_filter(docs, text_col, shingle_n).select(
        "doc_id",
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash:long) — 64-bit Charikar simhash over token hashes.

    Token hash = xxhash64(token); bit b of the simhash is 1 iff the sum of
    ±1 contributions of that bit across tokens is positive.  Pure
    aggregate/transform plan (no UDF): explode tokens → per-bit vote sums →
    pack.  One shuffle on doc_id.
    """
    toks = docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    h = toks.withColumn("th", F.xxhash64("tok"))
    votes = h.select(
        "doc_id",
        *[
            (
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
                .alias(f"b{b}")
            )
            for b in range(64)
        ],
    ).groupBy("doc_id").agg(*[F.sum(f"b{b}").alias(f"b{b}") for b in range(64)])
    packed = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (1 << b) if b < 63
                       else F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
                for b in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed


def simhash_near_pairs(sim: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates: equal top-``prefix_bits`` simhash prefix.

    The standard multi-probe trick is rotating bands; one prefix band keeps
    the demo cheap — callers can union several rotations.
    """
    keyed = sim.withColumn("pfx", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits))
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, (F.col("a.pfx") == F.col("b.pfx")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
