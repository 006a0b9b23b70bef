"""Property tests for the similarity-search tiers (operators/similarity.py):

* blocked exact all-pairs == naive theta-join exact all-pairs (same result,
  radically different plan)
* LSH near-dup pairs are a subset of the exact pairs (precision 1 after the
  verify stage), with non-trivial recall on the test data
* IVF: assignment is the true argmin centroid; probed top-k has non-trivial
  recall vs brute force and is a subset of the candidate lists scanned
"""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_blocked_exact_equals_naive(emb):
    from crawler_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_blocked,
    )

    naive = _pairs(embedding_near_dup_pairs(emb, threshold=0.4))
    blocked = _pairs(embedding_near_dup_pairs_blocked(emb, threshold=0.4, n_blocks=4))
    assert blocked == naive
    assert len(naive) > 0


def test_lsh_pairs_subset_of_exact_with_recall(emb):
    from crawler_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    exact = _pairs(embedding_near_dup_pairs(emb, threshold=0.4))
    lsh = _pairs(embedding_near_dup_pairs_lsh(emb, dim=DIM, threshold=0.4, bands=4, r=8))
    assert lsh <= exact  # verify stage makes precision exactly 1
    # recall is the (bands, r) knob: shorter rows collide far more often —
    # (bands=8, r=4) must recover a large fraction of the same exact set
    wide = _pairs(embedding_near_dup_pairs_lsh(emb, dim=DIM, threshold=0.4, bands=8, r=4))
    assert wide <= exact
    assert len(wide) >= 0.3 * len(exact)
    assert len(wide) > len(lsh)


def test_ivf_assignment_is_argmin(emb):
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import ivf_assign_col, ivf_fit

    cids, cents = ivf_fit(emb, DIM, nlist=8, iters=2)
    assert cids == sorted(cids)
    rows = (
        emb.withColumn("cid", ivf_assign_col(F.col("embedding"), cids, cents))
        .select("vec_id", "embedding", "cid")
        .collect()
    )
    C = np.array(cents)
    for r in rows[:50]:
        v = np.asarray(r.embedding, dtype=np.float64)
        d = ((C - v) ** 2).sum(axis=1)
        assert cids[int(np.argmin(d))] == r.cid


def test_ivf_topk_recall_vs_brute_force(emb):
    from crawler_spark.operators.similarity import brute_force_topk, ivf_ann_topk

    q_row = emb.filter("vec_id = 0").select("embedding").head()
    q = [float(x) for x in q_row[0]]
    exact = {r.vec_id for r in brute_force_topk(emb, q, k=10).collect()}
    ivf = {r.vec_id for r in ivf_ann_topk(emb, q, dim=DIM, k=10, nlist=8, nprobe=2).collect()}
    assert len(ivf) == 10
    assert len(ivf & exact) >= 5  # nprobe=2 of nlist=8 keeps most true neighbors


def test_int8_codes_bounded_and_zero_vec_safe(spark, emb):
    """Quantized codes stay in [-127, 127]; an all-zero vector quantizes to
    zeros instead of dividing by zero (scale gated to 0)."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import int8_quantize_col

    rows = (
        emb.select(int8_quantize_col(F.col("embedding")).alias("qv")).limit(200).collect()
    )
    assert rows
    for r in rows:
        assert all(-127 <= v <= 127 for v in r.qv)
        assert any(abs(v) == 127 for v in r.qv)  # max component pins the scale
    zero = spark.createDataFrame([(0, [0.0] * DIM)], "vec_id long, embedding array<float>")
    zq = zero.select(int8_quantize_col(F.col("embedding")).alias("qv")).head()
    assert list(zq.qv) == [0] * DIM


def test_int8_topk_recall_vs_brute_force(emb):
    """Quantized integer ranking keeps most of the exact top-k (the in_exact
    flag it ships is the recall numerator), and qdot is integer-typed."""
    from crawler_spark.operators.similarity import int8_ann_topk

    q_row = emb.filter("vec_id = 0").select("embedding").head()
    q = [float(x) for x in q_row[0]]
    out = int8_ann_topk(emb, q, k=10)
    assert dict(out.dtypes)["qdot"] == "bigint"
    rows = out.collect()
    assert len(rows) == 10
    assert sum(r.in_exact for r in rows) >= 7  # int8 loses little at 64-dim


def test_ivf_assignment_expr_and_arrow_paths_identical(emb, monkeypatch):
    """The Catalyst-expression argmin (the twin-spec form SQL_Q29 mirrors)
    and the default Arrow-batched numpy assignment must agree on EVERY row
    — both accumulate the squared distance dim-sequentially in float64, so
    equality is exact, not approximate."""
    from pyspark.sql import functions as F

    import crawler_spark.operators.similarity as S

    cids, cents = S.ivf_fit(emb, DIM, nlist=8, iters=2)

    def assign(thr):
        monkeypatch.setattr(S, "_IVF_EXPR_MAX_NLIST", thr)
        return dict(
            emb.withColumn("cid", S.ivf_assign_col(F.col("embedding"), cids, cents))
            .select("vec_id", "cid")
            .collect()
        )

    assert assign(8) == assign(0)  # expr path == arrow path, every row
