"""Behavioral pins for the q78 leakage-safe split and q79 hard-negative
mining compositions (queries.py) — the oracle twins prove engine equality;
these tests prove the SEMANTICS on cases constructed to exhibit them."""

import hashlib

import pytest

SF001 = "/root/testdata/sf0.001"


def test_q78_cluster_split_prevents_naive_leak(spark, tmpdir_path):
    """An exact-dup pair whose doc ids hash to DIFFERENT naive buckets
    (md5('1')='c4..' -> train, md5('3')='ec..' -> val) must land together
    under the cluster-keyed split, and be counted as naive leakage."""
    from crawler_spark.queries import q78_leakage_safe_split

    rows = [
        (1, "alpha beta gamma delta", "xx", "s", 22),
        (3, "alpha beta gamma delta", "xx", "s", 22),
        (5, "unrelated words entirely elsewhere tonight", "xx", "s", 42),
    ]
    # preconditions the case is built on
    assert hashlib.md5(b"1").hexdigest()[0] < "e"   # naive: train
    assert hashlib.md5(b"3").hexdigest()[0] >= "e"  # naive: val -> leak
    assert hashlib.md5(b"5").hexdigest()[0] >= "e"  # singleton: val
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmpdir_path}/documents.parquet")

    got = {
        r.split: (r.n_docs, r.n_clusters, r.n_dup_docs, r.naive_leaked_docs)
        for r in q78_leakage_safe_split(spark, str(tmpdir_path)).collect()
    }
    # cluster {1,3} keys by md5('1') -> train, BOTH members; the naive rule
    # would have split them -> both counted leaked
    assert got == {"train": (2, 1, 2, 2), "val": (1, 1, 0, 0)}


def test_q79_mined_pairs_satisfy_the_contract(spark):
    """Every mined hard negative must (a) sit in the word-set Jaccard band
    [0.6, 0.9) recomputed brute-force in Python, (b) not be a phrase
    near-dup, (c) not be an image phash near-dup, (d) come at most 3 per
    anchor ranked by (jaccard DESC, id ASC)."""
    from crawler_spark.operators.dedup_text import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
        shingle_table,
    )
    from crawler_spark.operators.image_dedup import phash_near_dup_pairs
    from crawler_spark.queries import _image_hash_table, q79_clip_hard_negatives, t

    rows = q79_clip_hard_negatives(spark, SF001).collect()
    if not rows:
        pytest.skip("no mined pairs at sf0.001 (band empty at this scale)")

    texts = {
        r.doc_id: r.text
        for r in t(spark, SF001, "documents").select("doc_id", "text").collect()
    }
    near = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(
            t(spark, SF001, "documents"),
            lsh_candidate_pairs(t(spark, SF001, "documents"), k=6, bands=3),
            threshold=0.5,
        ).collect()
    }
    img = {
        (r.id_a, r.id_b)
        for r in phash_near_dup_pairs(
            _image_hash_table(spark, SF001), max_hamming=3, bands=4
        ).collect()
    }

    per_anchor: dict[int, list] = {}
    for r in rows:
        a, b = r.anchor, r.negative
        key = (min(a, b), max(a, b))
        sa, sb = set(texts[a].split(" ")), set(texts[b].split(" "))
        jac = len(sa & sb) / len(sa | sb)
        assert 600 <= int(jac * 1000) < 900, (a, b, jac)
        assert key not in near, f"phrase near-dup mined as negative: {key}"
        assert key not in img, f"image near-dup mined as negative: {key}"
        per_anchor.setdefault(a, []).append((r.rk, r.jac_permille, b))
    for a, lst in per_anchor.items():
        lst.sort()
        assert [rk for rk, _, _ in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 3
        # rank order = (jac DESC, negative ASC)
        assert all(
            lst[i][1] > lst[i + 1][1]
            or (lst[i][1] == lst[i + 1][1] and lst[i][2] < lst[i + 1][2])
            for i in range(len(lst) - 1)
        )
