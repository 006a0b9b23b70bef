"""Similarity search over embedding columns (array<float>).

Two tiers:

* brute-force cosine top-k  — the correctness baseline: JVM-side
  zip_with/aggregate dot products against a broadcast query vector, global
  top-k via orderBy+limit (Spark executes as per-partition TakeOrdered +
  driver merge — no full sort shuffle).
* LSH-bucketed ANN          — the scale path: random-hyperplane signatures
  (SimHash for vectors, Charikar '02) built from a seed-deterministic
  hyperplane matrix; candidates = same-bucket rows, then exact cosine
  re-rank inside buckets.  Probes only ~N/2^bits of the table per query.

Both avoid per-row Python: dot products are higher-order-function
expressions; the hyperplane projection is a vectorized pandas UDF over
Arrow batches (numpy matmul).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine_to",
    "cosine_pair",
    "brute_force_topk",
    "hyperplane_signature",
    "lsh_ann_topk",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_lsh",
]


def cosine_to(vec_col: Column, query: list[float]) -> Column:
    """Cosine similarity of an array<float> column to a constant query vector.

    Double-precision, sequential left-to-right folds (deterministic and
    oracle-reproducible).
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query)))
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    vn = F.sqrt(F.aggregate(F.transform(v, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (vn * F.lit(qn))


def brute_force_topk(
    emb: DataFrame, query: list[float], k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine (ties broken by id for determinism)."""
    return (
        emb.select(id_col, cosine_to(F.col(vec_col), query).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_pair(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float> columns (JVM-side folds)."""
    av = F.transform(a, lambda x: x.cast("double"))
    bv = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    an = F.sqrt(F.aggregate(F.transform(av, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    bn = F.sqrt(F.aggregate(F.transform(bv, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (an * bn)


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.4, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, cos ≥ threshold).

    O(N²) self-join — the correctness baseline for small dims/tables; the
    scale path is the LSH-bucketed variant below (candidate pairs only from
    colliding buckets).
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_pair(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_near_dup_pairs_lsh(
    emb: DataFrame, dim: int, threshold: float = 0.4, bits: int = 6,
    seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed near-dup pairs: candidates = same hyperplane bucket,
    then exact cosine verify.  Recall < 1 by construction (single band);
    scale cost drops from O(N²) to Σ_bucket O(n_b²)."""
    sigs = hyperplane_signature(emb, dim, bits, seed, id_col, vec_col)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = sigs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_pair(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def hyperplane_signature(
    emb: DataFrame, dim: int, bits: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket:int) — random-hyperplane LSH signature via Arrow batches.

    bucket = sign-bit pattern of H·v; cosine-similar vectors collide with
    probability 1 - theta/pi per bit.
    """
    H = _hyperplanes(dim, bits, seed)
    from pyspark.sql.functions import pandas_udf

    def _sig(vs):
        import pandas as pd

        mat = np.stack(vs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        proj = mat @ H.T  # (n, bits)
        bitvals = (proj > 0).astype(np.int64) << np.arange(bits, dtype=np.int64)
        return pd.Series(bitvals.sum(axis=1))

    sig_udf = pandas_udf(_sig, "long")
    return emb.select(id_col, vec_col).withColumn("bucket", sig_udf(F.col(vec_col)))


def lsh_ann_topk(
    emb: DataFrame, query: list[float], dim: int, k: int = 10, bits: int = 8,
    seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe only the query's hyperplane bucket, exact re-rank.

    Recall < 1 by construction (single probe); callers union multi-probe
    buckets (flip one bit at a time) to trade cost for recall.
    """
    H = _hyperplanes(dim, bits, seed)
    qv = np.asarray(query, dtype=np.float64)
    qbucket = int(((qv @ H.T > 0).astype(np.int64) << np.arange(bits)).sum())
    sigs = hyperplane_signature(emb, dim, bits, seed, id_col, vec_col)
    cand = sigs.filter(F.col("bucket") == qbucket)
    return (
        cand.select(id_col, cosine_to(F.col(vec_col), query).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )
