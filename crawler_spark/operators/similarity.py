"""Similarity search over embedding columns (array<float>).

Three tiers:

* brute-force cosine top-k  — the correctness baseline: JVM-side
  zip_with/aggregate dot products against a broadcast query vector, global
  top-k via orderBy+limit (Spark executes as per-partition TakeOrdered +
  driver merge — no full sort shuffle).
* blocked exact all-pairs   — exact near-dup pairs without a cartesian
  plan: rows hash into G blocks, the G(G+1)/2 block pairs fan out as
  independent tasks, and each task is one vectorized numpy matmul over
  Arrow batches.  Work is still O(N²) flops (it is the exact answer) but
  it is distributed evenly, shuffles O(N·G) rows instead of materializing
  O(N²) join rows, and never leaves vectorized code.
* LSH-bucketed ANN          — the scale path: random-hyperplane signatures
  (SimHash for vectors, Charikar '02).  Hyperplane components are derived
  from md5 (exact same float in any engine: int(md5[:8],16)/2³¹ − 1), so
  every LSH query has a bit-exact DuckDB oracle twin — no numpy RNG state.
  Candidates = same-bucket rows (multi-band / multi-probe union for
  recall), then exact cosine re-rank inside buckets.

No per-row Python anywhere: dot products are higher-order-function
expressions; hyperplane projections are vectorized pandas UDFs over Arrow
batches (numpy matmul).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine_to",
    "cosine_pair",
    "brute_force_topk",
    "int8_quantize_col",
    "int8_ann_topk",
    "md5_hyperplanes",
    "hyperplane_signature",
    "band_signatures",
    "lsh_ann_topk",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_blocked",
    "embedding_near_dup_pairs_lsh",
    "ivf_assign_col",
    "ivf_fit",
    "ivf_ann_topk",
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


def int8_quantize_col(vec_col: Column) -> Column:
    """Symmetric per-vector int8 quantization as an array<long> column.

    ``scale = 127 / max|x|``; component ``q_i = floor(x_i·scale + 0.5)``
    (written as floor(+0.5), not round(), so the half-way rule is pinned by
    construction instead of by engine dialect — Spark HALF_UP vs DuckDB
    half-away differ on negative halves).  All-zero vectors quantize to
    zeros.  This is the standard memory trick for embedding search at
    corpus scale: 4× smaller vectors and integer dot products, at a recall
    cost the exact re-rank tier absorbs.  Entirely JVM-side double math, so
    the quantized codes are bit-identical in any IEEE-754 engine.
    """
    v = F.transform(vec_col, lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
    return F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"))


def int8_ann_topk(
    emb: DataFrame, query: list[float], k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding", exact: DataFrame | None = None,
) -> DataFrame:
    """Top-k by INTEGER dot product over int8-quantized codes, with an
    ``in_exact`` flag marking members of the exact-cosine top-k (the recall
    measurement a quantized index ships with).

    Scale shape: the quantized scan is a pure map + TakeOrdered (no
    shuffle); the exact top-k used for the recall flag is the same
    brute-force tier q19 uses — at corpus scale the flag would be computed
    on a sampled query set, the quantized scan is the serving path.
    Integer outputs end-to-end, so the oracle value-hash is exact.

    ``exact``: optionally a precomputed ``brute_force_topk(emb, query, k)``
    result (columns ``id_col, cos``) so a caller already holding the exact
    tier (q19's method-comparison union) doesn't pay the brute-force scan
    twice.
    """
    mxq = max(abs(float(x)) for x in query)
    sq = 127.0 / mxq if mxq > 0 else 0.0
    import math as _math

    qq = [int(_math.floor(float(x) * sq + 0.5)) for x in query]
    qarr = F.array(*[F.lit(v) for v in qq])
    scored = emb.select(
        id_col,
        F.aggregate(
            F.zip_with(int8_quantize_col(F.col(vec_col)), qarr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qdot"),
    )
    topq = scored.orderBy(F.col("qdot").desc(), F.col(id_col).asc()).limit(k)
    if exact is None:
        exact = brute_force_topk(emb, query, k=k, id_col=id_col, vec_col=vec_col)
    exact = exact.select(id_col, F.lit(1).alias("in_exact"))
    return topq.join(F.broadcast(exact), id_col, "left").select(
        id_col, "qdot", F.coalesce("in_exact", F.lit(0)).alias("in_exact")
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
    """Exact near-dup pairs via a naive theta self-join.

    BroadcastNestedLoop O(N²) plan — kept ONLY as the tiny-sf recall
    cross-check for the blocked and LSH variants (tests).  Production exact
    path is ``embedding_near_dup_pairs_blocked``; approximate scale path is
    ``embedding_near_dup_pairs_lsh``.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_pair(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_near_dup_pairs_blocked(
    emb: DataFrame,
    threshold: float = 0.4,
    n_blocks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, cos ≥ threshold)
    via blocked matrix multiplication.

    Rows hash into ``n_blocks`` blocks; every block pair (g1 ≤ g2) becomes
    one applyInPandas group computing a single float64 matmul — each
    unordered row pair is evaluated in exactly one group.  Shuffle volume is
    O(N·n_blocks) rows (each row replicated once per block pair it joins),
    so pick n_blocks ≈ √(2·target_tasks): parallelism without blowup.
    Replaces round-1's cartesian BroadcastNestedLoopJoin (100 s → ~2 s at
    sf0.1) while returning the identical exact result.
    """
    spark = emb.sparkSession
    blocks = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("g"),
    )
    pair_rows = [
        (g1, g2, g1 * n_blocks + g2)
        for g1 in range(n_blocks)
        for g2 in range(g1, n_blocks)
    ]
    pairs = spark.createDataFrame(pair_rows, "g1 int, g2 int, pair_id int")
    side_a = blocks.join(F.broadcast(pairs), blocks.g == pairs.g1).select(
        "pair_id", F.lit(0).alias("side"), "id", "vec", "g1", "g2"
    )
    side_b = blocks.join(F.broadcast(pairs), blocks.g == pairs.g2).select(
        "pair_id", F.lit(1).alias("side"), "id", "vec", "g1", "g2"
    )
    both = side_a.unionByName(side_b)

    def _block(pdf):
        import pandas as pd

        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        diag = bool(pdf["g1"].iloc[0] == pdf["g2"].iloc[0])
        a = pdf[pdf["side"] == 0]
        b = a if diag else pdf[pdf["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return empty
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a["vec"]])
        B = A if diag else np.stack([np.asarray(v, dtype=np.float64) for v in b["vec"]])
        na = np.sqrt((A * A).sum(axis=1))
        nb = na if diag else np.sqrt((B * B).sum(axis=1))
        cos = (A @ B.T) / np.outer(na, nb)
        ii, jj = np.nonzero(cos >= threshold)
        ids_a = a["id"].to_numpy()[ii]
        ids_b = b["id"].to_numpy()[jj]
        keep = ids_a < ids_b if diag else np.ones(len(ids_a), dtype=bool)
        ids_a, ids_b, vals = ids_a[keep], ids_b[keep], cos[ii, jj][keep]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids_a, ids_b),
                "id_b": np.maximum(ids_a, ids_b),
                "cos": vals,
            }
        )

    return both.groupBy("pair_id").applyInPandas(_block, "id_a long, id_b long, cos double")


# ---------------------------------------------------------------------------
# md5-derived hyperplane LSH (engine-portable: no RNG state, exact twin SQL)
# ---------------------------------------------------------------------------


def md5_hyperplane(p: int, i: int, tag: str = "hp") -> float:
    """Component i of hyperplane p: int(md5('tag:p:i')[:8], 16)/2³¹ − 1.

    Exact in float64 (integer < 2³², division by a power of two), and
    reproducible in any engine with md5 + hex→int (DuckDB twin:
    ``CAST('0x' || substr(md5('tag:p:i'),1,8) AS BIGINT)/2147483648.0 - 1``).
    """
    hx = hashlib.md5(f"{tag}:{p}:{i}".encode()).hexdigest()[:8]
    return int(hx, 16) / 2147483648.0 - 1.0


def md5_hyperplanes(dim: int, n_planes: int, tag: str = "hp") -> np.ndarray:
    return np.array(
        [[md5_hyperplane(p, i, tag) for i in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )


def hyperplane_signature(
    emb: DataFrame, dim: int, bits: int = 8, tag: str = "hp",
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, bucket:long) — sign-bit pattern of H·v via Arrow batches.

    bucket = Σ (H_p·v > 0) << p; cosine-similar vectors collide with
    probability (1 − θ/π)^bits.
    """
    H = md5_hyperplanes(dim, bits, tag)
    from pyspark.sql.functions import pandas_udf

    def _sig(vs):
        import pandas as pd

        mat = np.stack(vs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        proj = mat @ H.T  # (n, bits)
        bitvals = (proj > 0).astype(np.int64) << np.arange(bits, dtype=np.int64)
        return pd.Series(bitvals.sum(axis=1))

    sig_udf = pandas_udf(_sig, "long")
    return emb.select(id_col, vec_col).withColumn("bucket", sig_udf(F.col(vec_col)))


def band_signatures(
    emb: DataFrame, dim: int, bands: int = 4, r: int = 8, tag: str = "hp",
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, band:int, bucket:long) — one bucket per band, exploded.

    Band b uses hyperplanes p = b·r … b·r+r−1 from the shared md5 family.
    One Arrow pass computes all bands' projections (a single (n, bands·r)
    matmul), then the per-band buckets explode into rows for the bucket
    equi-join — the multi-band union that buys recall without all-pairs.
    """
    H = md5_hyperplanes(dim, bands * r, tag)
    from pyspark.sql.functions import pandas_udf

    def _sigs(vs):
        import pandas as pd

        mat = np.stack(vs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        proj = mat @ H.T  # (n, bands*r)
        bits = (proj > 0).astype(np.int64)
        out = []
        for b in range(bands):
            sl = bits[:, b * r : (b + 1) * r]
            out.append((sl << np.arange(r, dtype=np.int64)).sum(axis=1))
        return pd.Series(np.stack(out, axis=1).tolist())

    sig_udf = pandas_udf(_sigs, "array<long>")
    sigs = emb.select(id_col, vec_col).withColumn("buckets", sig_udf(F.col(vec_col)))
    return sigs.select(
        id_col,
        vec_col,
        F.posexplode("buckets").alias("band", "bucket"),
    )


def embedding_near_dup_pairs_lsh(
    emb: DataFrame, dim: int, threshold: float = 0.4, bands: int = 4, r: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Multi-band LSH near-dup pairs: candidates from any colliding band
    bucket, deduped, then exact cosine verify (JVM-side fold).

    Recall < 1 by construction but tunable via (bands, r); cost drops from
    O(N²) to Σ_band Σ_bucket O(n_b²).  Deterministic end-to-end (md5
    hyperplanes) — the DuckDB oracle reproduces the exact pair set.
    """
    sigs = band_signatures(emb, dim, bands, r, id_col=id_col, vec_col=vec_col).localCheckpoint(eager=True)
    a = sigs.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = sigs.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", cosine_pair(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: deterministic k-means partitioning + probe
# ---------------------------------------------------------------------------


# Above this many centroids the Catalyst expression argmin (nlist·dim folds
# PER ROW in one expression tree) is replaced by an Arrow-batched numpy
# assignment.  Measured (local[32], 64-dim): the expression path is SLOWER
# even at nlist=8 — higher-order functions (aggregate/zip_with) evaluate
# interpreted per-row, and each fresh 512-literal tree costs a driver
# analysis+codegen pass per iteration — 2.2× at 2k rows (compile-bound) and
# 2.6× at 200k rows (per-row-bound), bit-identical outputs.  So the Arrow
# path is the default at EVERY nlist; the expression form remains as the
# executable twin-spec of the assignment semantics (it is what SQL_Q29
# mirrors) and the fallback where Arrow is unavailable.
_IVF_EXPR_MAX_NLIST = 0


def ivf_assign_col(vec_col: Column, cids: list[int], cents: list[list[float]]) -> Column:
    """cid of the nearest centroid (squared-L2; ties → lowest cid).

    Centroids arrive as an inline literal (small-nlist expression path) or a
    task-broadcast numpy array (pandas-UDF path) — assignment is a pure map
    (zero shuffle), the same broadcast-the-centers pattern MLlib KMeans uses.
    State size is nlist·dim floats; fine up to ~10⁵ entries (nlist≈√N with
    sampled training keeps it there even at 100 TB — e.g. 4096×256).  ``cents``
    MUST be sorted by cid so first-match-of-min == lowest-cid tie-break.

    Both paths are BIT-IDENTICAL: the numpy path accumulates the squared
    distance dimension-sequentially (one IEEE float64 add per dim, same
    order as the expression fold and the DuckDB twin's list_sum), and
    ``argmin`` takes the first minimum — lowest cid, since cents is sorted.
    """
    if len(cids) <= _IVF_EXPR_MAX_NLIST:
        C = F.array(*[F.array(*[F.lit(float(x)) for x in cv]) for cv in cents])
        ids = F.array(*[F.lit(int(c)) for c in cids])
        v = F.transform(vec_col, lambda x: x.cast("double"))
        dists = F.transform(
            C,
            lambda cv: F.aggregate(
                F.zip_with(v, cv, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return F.element_at(ids, F.array_position(dists, F.array_min(dists)).cast("int"))

    cent_arr = np.asarray(cents, dtype=np.float64)  # (k, d)
    # int32, matching the expression path's IntegerType (centroid ids are
    # init vec_ids, bounded by nlist <= ~1e5)
    id_arr = np.asarray([int(c) for c in cids], dtype=np.int32)

    def _assign(s):
        import pandas as pd

        x = np.array([np.asarray(v, dtype=np.float64) for v in s], dtype=np.float64)
        if x.size == 0:
            return pd.Series(np.empty(0, dtype=np.int32))
        acc = np.zeros((x.shape[0], cent_arr.shape[0]), dtype=np.float64)
        for d in range(cent_arr.shape[1]):  # dim-sequential: fold-order exact
            diff = x[:, d, None] - cent_arr[None, :, d]
            acc += diff * diff
        return pd.Series(id_arr[acc.argmin(axis=1)])

    return F.pandas_udf(_assign, "int")(vec_col)


def ivf_fit(
    emb: DataFrame, dim: int, nlist: int = 8, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[list[int], list[list[float]]]:
    """Deterministic Lloyd k-means: init = the nlist lowest-id vectors, a
    fixed number of iterations, centroid components rounded to 6 dp.

    Every step is engine-portable (no RNG), so a SQL twin reproduces the
    exact same centroids: assignment = argmin over an N×nlist broadcast
    product; update = posexplode → partial-aggregated avg over only
    nlist·dim keys (shuffle volume is O(partitions·nlist·dim) rows — flat
    in N).  The rounding makes cross-engine float-sum-order differences
    vanish.  At 100 TB, fit on ``emb.sample(...)`` — assignment of the full
    table stays a map-only pass either way.  Returns (cids, centroids)
    sorted by cid; empty clusters drop out (deterministically in any engine).
    """
    e = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    init = e.filter(F.col("vid") < nlist).orderBy("vid").collect()
    cids = [int(r.vid) for r in init]
    cents = [[round(float(x), 6) for x in r.v] for r in init]
    for _ in range(iters):
        assigned = e.withColumn("cid", ivf_assign_col(F.col("v"), cids, cents))
        upd = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cid.setdefault(int(r.cid), {})[int(r.pos)] = float(r.m)
        cids = sorted(by_cid)
        cents = [[by_cid[c][p] for p in range(dim)] for c in cids]
    return cids, cents


def ivf_ann_topk(
    emb: DataFrame, query: list[float], dim: int, k: int = 10,
    nlist: int = 8, nprobe: int = 2, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: k-means-partition the vectors, scan only the ``nprobe``
    lists whose centroids are nearest the query, exact cosine re-rank.

    The scan prunes to ~nprobe/nlist of the data (vs LSH's bucket-collision
    pruning) and the probed-partition filter pushes down to the scan when the
    table is stored partitioned/clustered by cid — the classic IVF layout.
    """
    cids, cents = ivf_fit(emb, dim, nlist, iters, id_col, vec_col)
    qv = np.asarray(query, dtype=np.float64)
    qd = [float(((qv - np.asarray(c)) ** 2).sum()) for c in cents]
    order = sorted(range(len(cids)), key=lambda i: (qd[i], cids[i]))[:nprobe]
    probe = [cids[i] for i in order]
    cand = emb.withColumn("cid", ivf_assign_col(F.col(vec_col), cids, cents)).filter(
        F.col("cid").isin(probe)
    )
    return (
        cand.select(id_col, cosine_to(F.col(vec_col), query).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_ann_topk(
    emb: DataFrame, query: list[float], dim: int, k: int = 10, bits: int = 6,
    tag: str = "hp", multiprobe: bool = True,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the query's hyperplane bucket (plus, with
    ``multiprobe``, every flip-one-bit neighbor bucket), exact re-rank.

    Multi-probe raises recall from a single band without extra tables —
    the standard LSH trade (probe 1+bits buckets ≈ (1+bits)/2^bits of N).
    """
    H = md5_hyperplanes(dim, bits, tag)
    qv = np.asarray(query, dtype=np.float64)
    qbucket = int(((qv @ H.T > 0).astype(np.int64) << np.arange(bits)).sum())
    probes = [qbucket] + ([qbucket ^ (1 << i) for i in range(bits)] if multiprobe else [])
    sigs = hyperplane_signature(emb, dim, bits, tag, id_col, vec_col)
    cand = sigs.filter(F.col("bucket").isin(probes))
    return (
        cand.select(id_col, cosine_to(F.col(vec_col), query).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )
