"""URL-seen dedup: partitioned Bloom fast path + exact anti-join (SURVEY.md U2).

The reference bypasses its duplicate filter (reference
BackLogFetcher.java:115 ``setSkipDuplicateFilter(true)``) and gets
at-most-once from savepoints; the north rule instead demands a partitioned
Bloom/cuckoo URL-seen set with canonicalized hashing.  Design:

* ground truth  — the ``url_seen`` table; admission is an exact LEFT ANTI
  join against it (membership is the checked invariant).
* fast path     — per-bucket Bloom filters over ``url_hash = xxhash64(url)``
  (Spark's JVM-side xxhash64 — the canonical URL never leaves the JVM for
  hashing).  Candidates whose bucket filter says "definitely unseen" skip
  the anti-join probe entirely; only probable hits join.  The Bloom bits are
  built per hash-bucket with ``applyInPandas`` (numpy bitset, double
  hashing) so each partition's filter is independent — at cluster scale the
  bits live beside the checkpoint per partition and are OR-merged
  incrementally instead of rebuilt.

The Bloom filter only PRUNES probes; admitted membership is identical with
the fast path on or off (tested in tests/test_dedup.py).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_url_hash",
    "admit_new_exact",
    "bloom_build",
    "bloom_collect",
    "bloom_merge",
    "bloom_probe",
    "bloom_probe_map",
    "admit_new_bloom",
    "admit_new_bloom_map",
]


def with_url_hash(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical 64-bit key: JVM-side xxhash64 over the canonical URL string."""
    return df.withColumn("url_hash", F.xxhash64(F.col(url_col)))


def admit_new_exact(candidates: DataFrame, url_seen: DataFrame) -> DataFrame:
    """Exact first-submission-wins: candidates NOT IN url_seen (left anti)."""
    return candidates.join(url_seen.select("url"), "url", "left_anti")


# ---------------------------------------------------------------------------
# Partitioned Bloom filter over int64 url_hash
# ---------------------------------------------------------------------------


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    n = max(1, n_items)
    n_bits = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    n_bits = (n_bits + 63) // 64 * 64
    k = max(1, round(n_bits / n * math.log(2)))
    return n_bits, min(k, 16)


def _indices(hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """k double-hashed bit indices per input hash → (len, k) int64 array."""
    h1 = hashes.astype(np.uint64)
    h2 = (h1 >> np.uint64(17) | h1 << np.uint64(47)) * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def _build_bits(hashes: np.ndarray, n_bits: int, k: int) -> bytes:
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    idx = _indices(hashes, n_bits, k).ravel()
    np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))
    return bits.tobytes()


def _probe_bits(hashes: np.ndarray, bits: bytes, n_bits: int, k: int) -> np.ndarray:
    arr = np.frombuffer(bits, dtype=np.uint8)
    idx = _indices(hashes, n_bits, k)
    hit = (arr[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
    return hit.all(axis=1)


def bloom_build(
    url_seen: DataFrame,
    n_buckets: int = 16,
    expected_per_bucket: int = 100_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Per-bucket Bloom bits over url_hash → DF(bucket, bits, n_bits, k).

    Built with applyInPandas so each hash-bucket's bitset is produced by the
    partition holding its keys — no driver collect of the seen set.
    """
    n_bits, k = _bloom_params(expected_per_bucket, fpp)

    def _build(pdf):
        import pandas as pd

        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bits": [_build_bits(hashes, n_bits, k)],
                "n_bits": [n_bits],
                "k": [k],
            }
        )

    hashed = url_seen.withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    return hashed.select("bucket", "url_hash").groupBy("bucket").applyInPandas(
        _build, "bucket int, bits binary, n_bits int, k int"
    )


def bloom_collect(bloom: DataFrame) -> dict:
    """Collect a bloom DF (one tiny row per bucket) into a driver-side map.

    The map is the engine's INCREMENTAL state: per round only the admitted
    delta's bits are built distributed and OR-merged in, instead of
    rebuilding over the whole url_seen set (O(Δ) per round, not O(N))."""
    return {
        r["bucket"]: (bytes(r["bits"]), int(r["n_bits"]), int(r["k"]))
        for r in bloom.collect()
    }


def bloom_merge(blooms: list[dict]) -> dict:
    """OR-merge per-bucket bits dicts (incremental update path)."""
    out: dict = {}
    for b in blooms:
        for bucket, (bits, n_bits, k) in b.items():
            if bucket in out:
                obits, on, ok_ = out[bucket]
                assert on == n_bits and ok_ == k, "incompatible bloom params"
                merged = (
                    np.frombuffer(obits, dtype=np.uint8) | np.frombuffer(bits, dtype=np.uint8)
                ).tobytes()
                out[bucket] = (merged, n_bits, k)
            else:
                out[bucket] = (bits, n_bits, k)
    return out


def bloom_probe(candidates: DataFrame, bloom: DataFrame, n_buckets: int) -> DataFrame:
    """bloom_probe_map over a just-collected bloom DF (non-incremental path)."""
    return bloom_probe_map(candidates, bloom_collect(bloom), n_buckets)


def bloom_probe_map(candidates: DataFrame, bloom_map: dict, n_buckets: int) -> DataFrame:
    """Add ``probably_seen`` to candidates (must carry url_hash).

    The bloom map (one entry per bucket) is broadcast — it is tiny by
    construction (n_buckets × n_bits/8 bytes), the frontier-sized side
    streams through applyInPandas per bucket.
    """
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(bloom_map)
    cols = [f.name for f in candidates.schema.fields]
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields]
    out_schema = ", ".join(out_fields + ["probably_seen boolean"])

    def _probe(pdf):
        bucket = int(pdf["bucket"].iloc[0])
        entry = bc.value.get(bucket)
        if entry is None:
            pdf["probably_seen"] = False
        else:
            bits, n_bits, k = entry
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
            pdf["probably_seen"] = _probe_bits(hashes, bits, n_bits, k)
        return pdf[cols + ["probably_seen"]]

    bucketed = candidates.withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandas(lambda pdf: _probe(pdf), out_schema)


def admit_new_bloom(
    candidates: DataFrame, url_seen: DataFrame, bloom: DataFrame, n_buckets: int
) -> DataFrame:
    """admit_new_bloom_map over a just-collected bloom DF."""
    return admit_new_bloom_map(candidates, url_seen, bloom_collect(bloom), n_buckets)


def admit_new_bloom_map(
    candidates: DataFrame, url_seen: DataFrame, bloom_map: dict, n_buckets: int
) -> DataFrame:
    """Bloom-pruned admission: identical result to admit_new_exact.

    definite-miss rows pass straight through; probable hits take the exact
    anti-join. Union of both = exact semantics with pruned join probes.
    """
    probed = bloom_probe_map(candidates, bloom_map, n_buckets)
    definite_new = probed.filter(~F.col("probably_seen")).drop("probably_seen")
    maybe_seen = probed.filter(F.col("probably_seen")).drop("probably_seen")
    confirmed_new = maybe_seen.join(url_seen.select("url"), "url", "left_anti")
    return definite_new.unionByName(confirmed_new)
