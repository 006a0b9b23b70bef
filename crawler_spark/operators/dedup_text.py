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
                   equal-prefix band joins

Portability note: hashes are md5-derived (not xxhash64) so every stage has
an exact ANSI-SQL twin for the DuckDB oracle (crawler_spark/queries.py).

Plan-shape discipline (the round-1 bench lesson): tokenization runs ONCE per
document.  Shingles are built by exploding shingle *positions* against a
materialized token-array column — never by higher-order lambdas that embed
``split(text)`` (Catalyst does not CSE non-cheap expressions inside lambda
bodies, so that shape re-tokenizes per shingle element: O(tokens²) per doc).
Minhash is then a plain ``groupBy(doc_id).agg(min(md5(j || shingle)))`` —
each md5 computed exactly once, with map-side partial aggregation collapsing
the exploded shingle rows before the shuffle.

At 100 TB: the banded self-join shuffles only (band_key, doc_id) pairs —
signatures are tiny (k×32 bytes); candidate verification joins back to
shingle sets by doc_id.  Hot band keys (boilerplate docs) are the skew risk:
``max_band_size`` (ON by default) caps candidates per band via a window rank
before the pair join; the oracle SQL mirrors the same deterministic cap.

Reusing signature tables (the production pattern)
-------------------------------------------------
Tokenization dominates the scan cost at corpus scale, so production
pipelines materialize the intermediate tiers ONCE and thread them through
every consumer instead of re-deriving the lineage per query:

    tk  = tokenized(docs).localCheckpoint(eager=True)       # split once
    sh3 = shingle_table(docs, toks=tk).localCheckpoint(eager=True)
    sh1 = shingle_table(docs, n=1, toks=tk)                  # same tokens
    cand = lsh_candidate_pairs(docs, shingles=sh3)           # consumer 1
    near = ngram_jaccard_pairs(docs, cand, shingles=sh3)     # consumer 2

Every stage here accepts its upstream tier as a parameter (``toks=``,
``shingles=``, ``sig=``-style) precisely so a single checkpoint can feed
dedup keep-lists, cluster labeling, incremental batch joins (q64's stored
band table) and hard-negative mining (q79) without re-tokenizing.
``crawler_spark.queries`` exposes session-scoped shared tiers
(``shared_shingles`` / ``shared_tokens``) that implement this memoization
for the registry queries; tests/test_dedup_text.py pins that composed
reuse is bit-identical to the from-scratch lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_dup_stats",
    "tokenized",
    "shingle_table",
    "minhash_signature",
    "lsh_band_table",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_near_pairs",
]

DEFAULT_MAX_BAND_SIZE = 64


def exact_dup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row summary: total rows, unique texts (md5-keyed), dupes."""
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_unique"),
        (F.count("*") - F.countDistinct(F.md5(F.col(text_col)))).alias("n_dupes"),
    )


def tokenized(docs: DataFrame, text_col: str = "text", min_tokens: int = 1) -> DataFrame:
    """(doc_id, toks:array<string>) — the text is split exactly once; the
    short-doc filter references the materialized token array."""
    return docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("toks")
    ).filter(F.size("toks") >= min_tokens)


def shingle_table(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, shingle) — word n-grams, one row per shingle occurrence.

    Explodes shingle start positions against the token-array column, so each
    token is read by array index (O(tokens) per doc, not O(tokens²)).
    Duplicate shingles are kept (min-hash and distinct-set stages each apply
    their own semantics downstream).

    Pass ``toks`` (a ``tokenized()`` table, ideally checkpointed) to build
    several shingle widths from ONE tokenization pass — the n-specific
    min-token filter is applied here either way, so
    ``shingle_table(d, n=n, toks=tokenized(d))`` ≡ ``shingle_table(d, n=n)``.
    """
    toked = (
        toks.filter(F.size("toks") >= n)
        if toks is not None
        else tokenized(docs, text_col, min_tokens=n)
    )
    ex = toked.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (n - 1))).alias("i"),
    )
    return ex.select(
        "doc_id",
        F.concat_ws(
            " ",
            *[F.element_at(F.col("toks"), (F.col("i") + j).cast("int")) for j in range(n)],
        ).alias("shingle"),
    )


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 6,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig:array<string>) — k minhashes as lexicographic-min md5s.

    min(md5(j || ':' || shingle)) over the shingle set is a valid minwise
    hash family (each j keys an independent permutation approximation) and
    is string-only, hence oracle-portable.  Computed as one hash-aggregate
    over the exploded shingle table: partial (map-side) min per doc, final
    min after a single shuffle on doc_id.  Pass ``shingles`` to reuse an
    already-built (ideally persisted) shingle table across stages.
    """
    sh = shingles if shingles is not None else shingle_table(docs, text_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"_m{j}")
        for j in range(k)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[f"_m{j}" for j in range(k)]).alias("sig"))
    )


def lsh_band_table(sig: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc_id, b, band_key) — md5 of each band's signature slice."""
    r = k // bands
    return sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"),
        "sig",
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


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 6,
    bands: int = 3,
    shingle_n: int = 3,
    max_band_size: int | None = DEFAULT_MAX_BAND_SIZE,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidate pairs (doc_a < doc_b) via banded minhash LSH.

    rows_per_band = k // bands; a pair collides iff some band's rows are all
    equal — banding trades precision for recall as usual.  ``max_band_size``
    (default ON) caps pair blowup from degenerate hot bands — the skew guard
    at scale; the cap is deterministic (row_number ordered by doc_id) so the
    oracle SQL reproduces it exactly.

    The band table is materialized ONCE via ``localCheckpoint`` before the
    self-join: both join sides read the one materialization instead of
    re-running the minhash lineage twice, and the blocks are released by the
    ContextCleaner when the result DataFrame is garbage-collected — no
    caller-side ``unpersist``/``clearCache`` obligation (round 2 used
    ``persist``, which leaked into the block manager across registry
    queries).  (At cluster scale this is a checkpoint to the state store.)
    """
    sig = minhash_signature(docs, text_col, k, shingle_n, shingles=shingles)
    exploded = lsh_band_table(sig, k, bands)
    if max_band_size is not None:
        w = Window.partitionBy("b", "band_key").orderBy("doc_id")
        exploded = (
            exploded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_band_size)
            .drop("_rn")
        )
    exploded = exploded.localCheckpoint(eager=True)
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
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification stage).

    Joins each side's distinct shingle set by doc_id; Jaccard via
    array_intersect / array_union sizes — JVM-side, no UDF.  Pass the same
    persisted ``shingles`` used for candidate generation to verify without
    recomputing the tokenize→shingle lineage.
    """
    sh = shingles if shingles is not None else shingle_table(docs, text_col, shingle_n)
    dsh = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("sh"))
    j = (
        pairs.join(dsh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(dsh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


# simhash token bound: the per-bit one-counts are summed in packed 16-bit
# lanes (see simhash64), and the top lane sits at shift 48 — a per-doc token
# count ≤ 32767 keeps every lane carry-free AND the top-lane sum < 2^63.
# Docs beyond the cap hash their first 32767 tokens (the usual practical
# truncation for sketching very long documents); the oracle twin slices
# identically so engine/oracle equality holds at any length.
SIMHASH_MAX_TOKENS = 32767


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash:long) — 64-bit Charikar simhash over token md5s.

    Token hash = md5(token); bit b of the simhash is 1 iff the sum of ±1
    contributions of that bit across tokens is positive — equivalently iff
    2·ones(b) > n_tokens.  Bit b is read from hex digit b//4 of the md5
    (nibble >> (3 − b%4)) — md5-derived so the DuckDB oracle computes the
    identical value (round-1 used xxhash64, which has no portable twin).

    Plan shape: the 64 per-bit one-counts are summed as 16 LANE-PACKED longs
    (one per md5 nibble; the nibble's 4 bits spread into 16-bit lanes at
    shifts 48/32/16/0), so the aggregate is 16 SUMs + COUNT instead of the
    64 SUMs of the naive plan — round 2's version carried the largest
    codegen/aggregate constant in the registry for its row count.  Lanes are
    carry-free because tokens-per-doc is capped at SIMHASH_MAX_TOKENS.  The
    64-way unpack runs on one row per doc after the shuffle.  One shuffle on
    doc_id, map-side partial aggregation intact.
    """
    # small-input guard: a single-row-group parquet gives ONE scan split and
    # the per-token hashing is CPU-heavy; spread it when the scan has fewer
    # files than cores (no-op at scale — real inputs carry many splits, and
    # the repartition would otherwise shuffle the full text).
    from crawler_spark.operators import ensure_scan_parallelism

    docs = ensure_scan_parallelism(docs)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.slice(F.split(F.col(text_col), " "), 1, SIMHASH_MAX_TOKENS)
        ).alias("tok"),
    )
    h = toks.select("doc_id", F.md5("tok").alias("hx"))

    def spread(n: int):
        """Nibble n (hex digit n of the md5) → 4 bit-flags in 16-bit lanes:
        bit 4n+k lands at lane shift 48−16k (lane order mirrors the bit
        numbering used by the unpack below and the DuckDB twin)."""
        v = F.conv(F.substring("hx", n + 1, 1), 16, 10).cast("long")
        return (
            F.shiftleft(F.shiftright(v, 3).bitwiseAND(F.lit(1)), 48)
            + F.shiftleft(F.shiftright(v, 2).bitwiseAND(F.lit(1)), 32)
            + F.shiftleft(F.shiftright(v, 1).bitwiseAND(F.lit(1)), 16)
            + v.bitwiseAND(F.lit(1))
        ).alias(f"s{n}")

    lanes = (
        h.select("doc_id", *[spread(n) for n in range(16)])
        .groupBy("doc_id")
        .agg(F.count("*").alias("_n"), *[F.sum(f"s{n}").alias(f"s{n}") for n in range(16)])
    )

    def ones(b: int):
        return F.shiftright(F.col(f"s{b // 4}"), 48 - 16 * (b % 4)).bitwiseAND(F.lit(65535))

    packed = lanes.select(
        "doc_id",
        sum(
            [
                F.when(
                    ones(b) * 2 > F.col("_n"),
                    F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
                for b in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed


def simhash_near_pairs(
    sim: DataFrame,
    bands: int = 4,
    max_band_size: int | None = DEFAULT_MAX_BAND_SIZE,
) -> DataFrame:
    """Near-dup candidates: any equal ``64//bands``-bit simhash band slice
    (banded Hamming LSH, same scheme as image_dedup.phash_near_dup_pairs).

    By pigeonhole any pair with Hamming distance ≤ bands−1 shares a band, so
    the default 4×16-bit banding has FULL recall at distance ≤ 3 — strictly
    better than round 2's single top-16-bit prefix, which missed any near-dup
    whose flipped bit landed in the prefix.

    Band key b = ``(simhash >> b·width) & (2^width − 1)``: arithmetic shift +
    mask equals logical shift + mask for every band (the mask keeps only bits
    below the sign-fill region), so the DuckDB oracle's plain ``>>``
    reproduces the keys exactly on negative simhashes.

    ``max_band_size`` (ON by default — simhashes of boilerplate-heavy corpora
    cluster, and one hot band bucket otherwise goes quadratic at scale) caps
    rows per (band, band_key) via a deterministic row_number ordered by
    doc_id, the same skew guard as lsh_candidate_pairs; pass ``None`` for the
    exact pigeonhole guarantee on small corpora.

    The capped band table is materialized once via ``localCheckpoint``
    before the self-join (same contract as lsh_candidate_pairs): the simhash
    lineage and the cap's window shuffle run once, both join sides read the
    one materialization, and the ContextCleaner releases the blocks when the
    result is garbage-collected — no caller-side cache management.
    """
    if 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    mask = (1 << width) - 1
    keys = F.array(
        *[
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )
    keyed = sim.select("doc_id", F.posexplode(keys).alias("band", "band_key"))
    if max_band_size is not None:
        w = Window.partitionBy("band", "band_key").orderBy("doc_id")
        keyed = (
            keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_band_size)
            .drop("_rn")
        )
    keyed = keyed.localCheckpoint(eager=True)
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
