"""Banded-Hamming phash near-dup over the image+caption payload table.

The banding guarantee is exact for hamming ≤ bands-1, so every test compares
against a brute-force O(N²) python recompute — identical pair sets, not just
plausible ones.
"""

import itertools

import pytest


def _brute_pairs(rows, max_hamming):
    out = set()
    for (ida, pa), (idb, pb) in itertools.combinations(sorted(rows), 2):
        h = bin((pa ^ pb) & ((1 << 64) - 1)).count("1")
        if h <= max_hamming:
            out.add((ida, idb, h))
    return out


def _spark_pairs(df):
    return {(r.id_a, r.id_b, r.hamming) for r in df.collect()}


def test_crafted_bitflips_exact(spark):
    from crawler_spark.operators.image_dedup import phash_near_dup_pairs

    base = 0x0123456789ABCDEF

    def flip(x, bits):
        for b in bits:
            x ^= 1 << b
        return x

    # signed int64 view (parquet/Spark phash is int64; bit 63 set → negative)
    def s64(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    rows = [
        ("a", base),
        ("b", flip(base, [3])),            # hamming(a,b)=1
        ("c", flip(base, [3, 17, 40])),    # hamming(a,c)=3, (b,c)=2
        ("d", flip(base, list(range(20)))),  # far from everything
        ("e", flip(base, [63])),           # sign-bit flip: hamming(a,e)=1
    ]
    df = spark.createDataFrame(
        [(i, s64(p)) for i, p in rows], "image_id string, phash long"
    )
    got = _spark_pairs(phash_near_dup_pairs(df, max_hamming=3, bands=4))
    want = _brute_pairs([(i, p) for i, p in rows], 3)
    assert got == want
    assert ("a", "b", 1) in got and ("a", "e", 1) in got and ("a", "c", 3) in got
    assert not any("d" in (x, y) for x, y, _ in got)


def test_matches_bruteforce_on_fixture_images(spark, tmpdir_path):
    """Full-recall check on real fixture phashes (64px PNG payload table)."""
    from crawler_spark.fixtures import generate
    from crawler_spark.operators.image_dedup import phash_near_dup_pairs

    generate(tmpdir_path, n_pages=96, n_hosts=4, seed=23)
    imgs = spark.read.parquet(f"{tmpdir_path}/images.parquet").select(
        "image_id", "phash"
    )
    local = [(r.image_id, r.phash & ((1 << 64) - 1)) for r in imgs.collect()]
    for mh in (0, 3):
        got = _spark_pairs(phash_near_dup_pairs(imgs, max_hamming=mh, bands=4))
        assert got == _brute_pairs(local, mh)


def test_band_table_slices_and_guard(spark):
    from pyspark.sql import functions as F

    from crawler_spark.operators.image_dedup import phash_band_table, phash_near_dup_pairs

    df = spark.createDataFrame([("x", -1)], "image_id string, phash long")
    rows = phash_band_table(df, bands=4).orderBy("band").collect()
    assert [r.band_key for r in rows] == [0xFFFF] * 4  # logical shift, no sign leak

    with pytest.raises(ValueError):
        phash_band_table(df, bands=5)

    # hot-band cap: 10 identical phashes, cap 2 → only the capped pair survives
    many = spark.createDataFrame(
        [(f"i{k:02d}", 42) for k in range(10)], "image_id string, phash long"
    )
    capped = phash_near_dup_pairs(many, max_hamming=0, bands=4, max_band_size=2)
    assert capped.count() == 1
    full = phash_near_dup_pairs(many, max_hamming=0, bands=4)
    assert full.count() == 45
    assert full.filter(F.col("hamming") != 0).count() == 0


def test_cluster_keeper_invariants(spark):
    """q77's keep rule against first principles at sf0.001: every image lands
    in exactly one cluster, the keeper is a member with the cluster's max
    pixel count (min image_id among ties), and pixel sums reconcile."""
    from crawler_spark.queries import (
        _image_dims_table,
        q77_image_cluster_keeper,
        t,
    )

    sf = "/root/testdata/sf0.001"
    out = {r.cluster: r for r in q77_image_cluster_keeper(spark, sf).collect()}
    dims = {
        r.image_id: r.w * r.h for r in _image_dims_table(spark, sf).collect()
    }
    n_docs = t(spark, sf, "documents").count()

    assert sum(r.n_members for r in out.values()) == n_docs
    assert sum(r.sum_pixels for r in out.values()) == sum(dims.values())
    for r in out.values():
        assert r.keeper in dims and dims[r.keeper] == r.keeper_pixels
        assert r.keeper_pixels <= r.sum_pixels
        # cluster label is the min member id, so the representative itself
        # must be a member — its pixels bound the keeper's from below
        assert dims[r.cluster] <= r.keeper_pixels
