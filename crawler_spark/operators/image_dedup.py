"""Perceptual-hash near-duplicate detection for image payloads.

The image+caption table (BASELINE.json ``input_hint``) carries a 64-bit
perceptual hash per row (``phash:int64``, functions/imaging.phash64 — DCT-free
average-hash over an 8×8 luma downsample).  Near-duplicate images are pairs
within a small Hamming distance of each other; at 10^10 rows an all-pairs
comparison is off the table, so this module uses the classic **banded
Hamming LSH** (the bit-sampling special case of Indyk–Motwani LSH):

* split the 64 bits into ``bands`` contiguous slices (default 4 × 16 bits);
* candidates = rows sharing any band slice — a plain equi-self-join on
  ``(band, band_key)``, the same bucketed shape as the text MinHash path
  (operators/dedup_text.py), never a cartesian;
* verify = exact Hamming via ``bit_count(phash_a XOR phash_b)`` — JVM-side.

By pigeonhole, any pair with Hamming distance ≤ bands-1 shares at least one
band, so for the default (bands=4, max_hamming=3) the result is EXACT — full
recall, not approximate.  Raising ``max_hamming`` above bands-1 keeps the
plan shape but becomes best-effort (raise ``bands`` to restore the
guarantee: bands ≥ max_hamming+1).

Skew note: unlike the text-LSH hot-band cap (dedup_text.DEFAULT_MAX_BAND_SIZE),
the cap here defaults OFF because band collision is what makes the algorithm
exact; pass ``max_band_size`` when the corpus has degenerate flat images
(all-zero/all-one phashes) and approximate recall is acceptable.

Reference parity: none — the reference discards non-text bodies outright
(BackLogFetcher.java:209-214); image near-dup is part of the
training-data-pipeline surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["phash_band_table", "phash_near_dup_pairs"]


def phash_band_table(
    images: DataFrame,
    bands: int = 4,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """(id, phash, band, band_key) — one row per (image, band slice).

    band_key b = (phash >>> (b·width)) & (2^width − 1), width = 64 // bands.
    Logical shift so the sign bit of int64 phashes cannot leak into lower
    slices.
    """
    if 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    mask = (1 << width) - 1
    keys = F.array(
        *[
            F.shiftrightunsigned(F.col(phash_col), b * width).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )
    return images.select(
        F.col(id_col).alias("id"),
        F.col(phash_col).alias("ph"),
        F.posexplode(keys).alias("band", "band_key"),
    )


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_band_size: int | None = None,
) -> DataFrame:
    """Near-dup image pairs (id_a < id_b, hamming ≤ max_hamming) via banded
    Hamming LSH — EXACT whenever max_hamming ≤ bands−1 (pigeonhole).

    Plan: posexplode band keys → equi-self-join on (band, band_key) →
    distinct candidate pairs → bit_count(xor) verify.  Shuffles O(N·bands)
    key rows; join fan-out is per-bucket, the same scale shape as
    dedup_text.lsh_candidate_pairs.
    """
    t = phash_band_table(images, bands, id_col, phash_col)
    if max_band_size is not None:
        w = Window.partitionBy("band", "band_key").orderBy("id")
        t = (
            t.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_band_size)
            .drop("_rn")
        )
    t = t.persist()
    a, b = t.alias("a"), t.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.ph").alias("ph_a"),
            F.col("b.ph").alias("ph_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
