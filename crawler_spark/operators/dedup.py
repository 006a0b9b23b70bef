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
  the anti-join probe entirely; only probable hits join.

The filter state is a DATAFRAME — one row per hash bucket, bits sized from
that bucket's OBSERVED count (not a global constant) — persisted beside the
checkpoint as a parquet table and updated/probed entirely executor-side:

* build  — ``applyInPandas`` per bucket: numpy bitset, double hashing;
  capacity = headroom × observed items (min floor), fpp-targeted sizing.
* update — cogrouped ``applyInPandas`` of (bloom row, round's admitted
  hashes): OR the delta's bits into the bucket at its existing geometry;
  new buckets size themselves from the delta.  O(Δ) work per round.
* probe  — cogrouped ``applyInPandas`` of (candidates, bloom row): the
  bits never transit the driver and are never broadcast (round 1 collected
  the whole filter into a driver dict and re-broadcast it every round —
  ~12 GB of driver bits at 10¹⁰ URLs, plus a broadcast leak).
* resize — a bucket whose ``n_items`` exceeds ``capacity`` degrades fpp but
  NEVER correctness (the filter only prunes anti-join probes); the engine
  rebuilds saturated buckets from url_seen with grown capacity.

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
    "BLOOM_SCHEMA",
    "with_bucket",
    "bloom_build",
    "bloom_update",
    "bloom_probe",
    "admit_new_bloom",
]

BLOOM_SCHEMA = "bucket int, bits binary, n_bits long, k int, n_items long, capacity long"
DEFAULT_FPP = 0.01
MIN_CAPACITY = 1024
HEADROOM = 2.0


def with_url_hash(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical 64-bit key: JVM-side xxhash64 over the canonical URL string."""
    return df.withColumn("url_hash", F.xxhash64(F.col(url_col)))


def admit_new_exact(candidates: DataFrame, url_seen: DataFrame) -> DataFrame:
    """Exact first-submission-wins: candidates NOT IN url_seen (left anti)."""
    return candidates.join(url_seen.select("url"), "url", "left_anti")


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))


# ---------------------------------------------------------------------------
# bitset primitives (numpy, executor-side only)
# ---------------------------------------------------------------------------


def _bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    n = max(1, capacity)
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


def _or_into(bits: np.ndarray, hashes: np.ndarray, n_bits: int, k: int) -> None:
    idx = _indices(hashes, n_bits, k).ravel()
    np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))


def _build_bits(hashes: np.ndarray, n_bits: int, k: int) -> bytes:
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    _or_into(bits, hashes, n_bits, k)
    return bits.tobytes()


def _probe_bits(hashes: np.ndarray, bits: bytes, n_bits: int, k: int) -> np.ndarray:
    arr = np.frombuffer(bits, dtype=np.uint8)
    idx = _indices(hashes, n_bits, k)
    hit = (arr[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
    return hit.all(axis=1)


def _sized_row(bucket: int, hashes: np.ndarray, fpp: float):
    capacity = max(MIN_CAPACITY, int(HEADROOM * len(hashes)))
    n_bits, k = _bloom_params(capacity, fpp)
    return {
        "bucket": bucket,
        "bits": _build_bits(hashes, n_bits, k),
        "n_bits": n_bits,
        "k": k,
        "n_items": len(hashes),
        "capacity": capacity,
    }


# ---------------------------------------------------------------------------
# DataFrame-level state lifecycle
# ---------------------------------------------------------------------------


def bloom_build(url_seen: DataFrame, n_buckets: int = 256, fpp: float = DEFAULT_FPP) -> DataFrame:
    """Per-bucket Bloom bits over url_hash → DF(BLOOM_SCHEMA).

    Each hash-bucket's bitset is produced by the partition holding its keys
    and sized from that bucket's observed count — no driver collect, no
    global size constant (round 1 hardcoded 100k/bucket: beyond ~10⁷ URLs
    fpp→1 while still paying the probe pass)."""
    import pandas as pd

    def _build(pdf):
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        return pd.DataFrame([_sized_row(int(pdf["bucket"].iloc[0]), hashes, fpp)])

    hashed = with_bucket(url_seen, n_buckets)
    return hashed.select("bucket", "url_hash").groupBy("bucket").applyInPandas(
        _build, BLOOM_SCHEMA
    )


def bloom_update(
    bloom: DataFrame, admitted: DataFrame, n_buckets: int, fpp: float = DEFAULT_FPP
) -> DataFrame:
    """OR the round's admitted url_hash delta into the filter — executor-side.

    Cogroup (bloom row, delta hashes) per bucket: existing buckets keep
    their geometry (bits OR delta), fresh buckets size from the delta.
    A bucket past capacity keeps absorbing (fpp degrades, correctness does
    not); the engine rebuilds it from url_seen when it notices
    ``n_items > capacity`` (the bloom table is n_buckets rows — checking is
    a trivial job)."""
    import pandas as pd

    delta = with_bucket(admitted.select("url_hash"), n_buckets).select("bucket", "url_hash")

    def _merge(key, old, new):
        bucket = int(key[0])
        hashes = new["url_hash"].to_numpy(dtype=np.int64) if len(new) else np.empty(0, np.int64)
        if len(old) == 0:
            if len(hashes) == 0:  # unreachable (cogroup keys exist on a side)
                return pd.DataFrame(
                    {
                        "bucket": pd.Series(dtype="int32"),
                        "bits": pd.Series(dtype=object),
                        "n_bits": pd.Series(dtype="int64"),
                        "k": pd.Series(dtype="int32"),
                        "n_items": pd.Series(dtype="int64"),
                        "capacity": pd.Series(dtype="int64"),
                    }
                )
            return pd.DataFrame([_sized_row(bucket, hashes, fpp)])
        row = old.iloc[0]
        bits = np.frombuffer(bytes(row["bits"]), dtype=np.uint8).copy()
        n_bits, k = int(row["n_bits"]), int(row["k"])
        if len(hashes):
            _or_into(bits, hashes, n_bits, k)
        return pd.DataFrame(
            [
                {
                    "bucket": bucket,
                    "bits": bits.tobytes(),
                    "n_bits": n_bits,
                    "k": k,
                    "n_items": int(row["n_items"]) + len(hashes),
                    "capacity": int(row["capacity"]),
                }
            ]
        )

    return (
        bloom.groupBy("bucket")
        .cogroup(delta.groupBy("bucket"))
        .applyInPandas(_merge, BLOOM_SCHEMA)
    )


def bloom_probe(candidates: DataFrame, bloom: DataFrame, n_buckets: int) -> DataFrame:
    """Add ``probably_seen`` to candidates (must carry url_hash).

    Cogrouped probe: each bucket's candidates meet that bucket's bits on the
    executors — the filter is never collected or broadcast.  A bucket with
    no bloom row (nothing seen there yet) probes definite-new.
    """
    cols = [f.name for f in candidates.schema.fields]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields]
        + ["probably_seen boolean"]
    )

    def _probe(key, cand, bl):
        if len(cand) == 0:
            return cand.assign(probably_seen=np.empty(0, dtype=bool))[cols + ["probably_seen"]]
        if len(bl) == 0:
            cand = cand.assign(probably_seen=False)
        else:
            row = bl.iloc[0]
            hashes = cand["url_hash"].to_numpy(dtype=np.int64)
            cand = cand.assign(
                probably_seen=_probe_bits(
                    hashes, bytes(row["bits"]), int(row["n_bits"]), int(row["k"])
                )
            )
        return cand[cols + ["probably_seen"]]

    bucketed = with_bucket(candidates, n_buckets)
    return (
        bucketed.groupBy("bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(_probe, out_schema)
    )


def admit_new_bloom(
    candidates: DataFrame, url_seen: DataFrame, bloom: DataFrame, n_buckets: int
) -> DataFrame:
    """Bloom-pruned admission: identical result to admit_new_exact.

    definite-miss rows pass straight through; probable hits take the exact
    anti-join. Union of both = exact semantics with pruned join probes.
    """
    probed = bloom_probe(candidates, bloom, n_buckets)
    definite_new = probed.filter(~F.col("probably_seen")).drop("probably_seen")
    maybe_seen = probed.filter(F.col("probably_seen")).drop("probably_seen")
    confirmed_new = maybe_seen.join(url_seen.select("url"), "url", "left_anti")
    return definite_new.unionByName(confirmed_new)


# engine-facing namespace: the fast-path filter is pluggable (north rule says
# "Bloom/cuckoo"); operators/cuckoo.py exposes the interchangeable CUCKOO_OPS.
# format_id versions the persisted state in the round manifest — a resume
# under a different filter kind (or bucketing) rebuilds instead of
# misreading foreign bytes.
from types import SimpleNamespace  # noqa: E402  (kept beside its single use)

BLOOM_OPS = SimpleNamespace(
    name="bloom",
    format_id=2,
    build=bloom_build,
    update=bloom_update,
    admit=admit_new_bloom,
)
