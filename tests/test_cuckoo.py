"""Cuckoo-filter URL-seen fast path (SURVEY.md U2, north rule "Bloom/cuckoo"):
admission identical to exact, no false negatives through incremental inserts
and DELETES, stash overflow correctness, and engine parity with the Bloom
backend including resume."""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import cuckoo as ck
from crawler_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def seen_and_cands(spark):
    seen_urls = [(f"http://h{i % 7}.example.com/p/{i}",) for i in range(0, 600, 2)]
    cand_urls = [(f"http://h{i % 7}.example.com/p/{i}",) for i in range(0, 600, 3)]
    seen = dd.with_url_hash(spark.createDataFrame(seen_urls, ["url"]))
    cands = dd.with_url_hash(spark.createDataFrame(cand_urls, ["url"]))
    return seen, cands


def test_cuckoo_equals_exact(seen_and_cands):
    seen, cands = seen_and_cands
    exact = {r.url for r in dd.admit_new_exact(cands, seen).collect()}
    filt = ck.cuckoo_build(seen, n_buckets=8)
    via = {r.url for r in ck.admit_new_cuckoo(cands, seen, filt, 8).collect()}
    assert via == exact


def test_cuckoo_incremental_update_equals_full_rebuild(spark, seen_and_cands):
    seen, cands = seen_and_cands
    first = seen.filter(F.col("url_hash") % 2 == 0)
    second = seen.filter(F.col("url_hash") % 2 != 0)
    merged = ck.cuckoo_update(ck.cuckoo_build(first, n_buckets=8), second.select("url_hash"), 8)
    full = ck.cuckoo_build(seen, n_buckets=8)
    adm_merged = {r.url for r in ck.admit_new_cuckoo(cands, seen, merged, 8).collect()}
    adm_full = {r.url for r in ck.admit_new_cuckoo(cands, seen, full, 8).collect()}
    exact = {r.url for r in dd.admit_new_exact(cands, seen).collect()}
    assert adm_merged == adm_full == exact


def test_cuckoo_no_false_negatives_and_counts(seen_and_cands):
    seen, _ = seen_and_cands
    filt = ck.cuckoo_probe(seen, ck.cuckoo_build(seen, n_buckets=8), 8)
    assert filt.filter(~F.col("probably_seen")).count() == 0


def test_cuckoo_delete_enables_readmission(spark, seen_and_cands):
    """The Bloom-impossible operation: expire members, re-admit exactly them."""
    seen, _ = seen_and_cands
    filt = ck.cuckoo_build(seen, n_buckets=8)
    expire = seen.filter(F.col("url_hash") % 5 == 0)
    keep = seen.join(expire.select("url"), "url", "left_anti")
    seen2, filt2 = ck.expire_for_recrawl(seen, filt, expire, 8)
    # expired members re-admit; retained members still dedupe — vs exact
    admitted = {r.url for r in ck.admit_new_cuckoo(seen, seen2, filt2, 8).collect()}
    assert admitted == {r.url for r in expire.select("url").collect()}
    # retained members still probe positive (delete stripped nobody else)
    probed = ck.cuckoo_probe(keep, filt2, 8)
    assert probed.filter(~F.col("probably_seen")).count() == 0


def test_cuckoo_stash_overflow_stays_exact(spark):
    """Force shard saturation far past capacity: inserts overflow into the
    stash, membership stays exact-member (zero false negatives), and the
    shard flags itself for the engine's rebuild sweep (n_items > capacity)."""
    n = 4 * ck.MIN_SLOTS * ck.SLOTS_PER_BUCKET  # 4x table size, single shard
    seen = spark.range(n).select(
        F.concat(F.lit("http://x.test/"), F.col("id")).alias("url")
    )
    seen = dd.with_url_hash(seen)
    filt = ck.cuckoo_build(seen.limit(1), n_buckets=1)  # tiny geometry
    filt = ck.cuckoo_update(filt, seen.select("url_hash"), 1)
    probed = ck.cuckoo_probe(seen, filt, 1)
    assert probed.filter(~F.col("probably_seen")).count() == 0
    row = filt.collect()[0]
    assert row["n_items"] > row["capacity"]
    assert len(row["stash"]) > 0  # the walk actually overflowed


def test_cuckoo_false_positive_rate_bounded(spark):
    """Fresh keys against a loaded filter: fpp stays within the fixed
    16-bit-fingerprint bound (~1.2e-4; assert a lenient 1e-3)."""
    n = 200_000
    seen = spark.range(n).select(F.xxhash64("id").alias("url_hash"))
    filt = ck.cuckoo_build(seen, n_buckets=16).persist()
    fresh = spark.range(n, n + 200_000).select(F.xxhash64("id").alias("url_hash"))
    fp = ck.cuckoo_probe(fresh, filt, 16).filter(F.col("probably_seen")).count()
    filt.unpersist()
    assert fp / 200_000 <= 1e-3


def test_engine_cuckoo_matches_bloom_and_resumes(spark, tmpdir_path):
    """Same crawl under seen_filter='cuckoo': identical url_seen membership
    to the Bloom engine, manifests carry the cuckoo format id, and resume
    re-admits nothing."""
    from crawler_spark.fixtures import generate
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig
    from crawler_spark.sources import snapshots as snap

    fix = os.path.join(tmpdir_path, "fix")
    generate(fix, n_pages=96, n_hosts=4, seed=7)
    cfg = CrawlConfig(max_rounds=4)
    ck_dir_b = os.path.join(tmpdir_path, "ckb")
    ck_dir_c = os.path.join(tmpdir_path, "ckc")
    eng_b = CrawlEngine(spark, fix, ck_dir_b, cfg)
    eng_b.run()
    eng_c = CrawlEngine(spark, fix, ck_dir_c, cfg, seen_filter="cuckoo")
    eng_c.run()
    seen_b = {r.url for r in eng_b.url_seen().collect()}
    seen_c = {r.url for r in eng_c.url_seen().collect()}
    assert seen_c == seen_b
    meta = (snap.read_manifest(ck_dir_c, 3) or {}).get("meta", {})
    assert meta.get("bloom_format") == 3
    # resume from the cuckoo checkpoint: filter state reloads (no rebuild
    # fallback needed) and nothing is re-admitted
    eng_r = CrawlEngine(spark, fix, ck_dir_c, cfg, seen_filter="cuckoo")
    eng_r.run(resume=True)
    assert {r.url for r in eng_r.url_seen().collect()} == seen_c
