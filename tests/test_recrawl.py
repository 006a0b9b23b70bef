"""TTL recrawl (CrawlConfig.recrawl_ttl_rounds — the deterministic analog of
the reference's cron-scheduled plan re-runs): stale members re-enter the
frontier at PRIORITY_RECRAWL on compaction rounds, get re-fetched, and the
url_seen membership / duplicate-free invariants survive, including resume."""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.fixtures import generate
from crawler_spark.plans.engine import CrawlEngine
from crawler_spark.plans.policy import PRIORITY_RECRAWL, CrawlConfig


@pytest.fixture(scope="module")
def tmpdir_module():
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="crawler_spark_recrawl_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def recrawl_run(spark, tmpdir_module):
    fix = os.path.join(tmpdir_module, "fix")
    generate(fix, n_pages=96, n_hosts=4, seed=7)
    ckpt = os.path.join(tmpdir_module, "ck")
    cfg = CrawlConfig(max_rounds=8, recrawl_ttl_rounds=3)
    eng = CrawlEngine(spark, fix, ckpt, cfg, compact_every=2)
    summary = eng.run()
    return eng, summary, fix, ckpt, cfg


def test_recrawl_refetches_stale_members(spark, recrawl_run):
    eng, summary, _fix, _ckpt, _cfg = recrawl_run
    assert summary.get("recrawled", 0) > 0
    log = eng.fetch_log()
    per_url = (
        log.groupBy("url")
        .agg(F.count("*").alias("n"), F.countDistinct("round").alias("n_rounds"))
        .filter(F.col("n_rounds") >= 2)
    )
    # at least one member was fetched again in a LATER round (freshness)
    assert per_url.count() > 0


def test_recrawl_preserves_membership_invariants(spark, recrawl_run):
    eng, _summary, fix, _ckpt, cfg = recrawl_run
    rows = eng.url_seen().collect()
    urls = [r.url for r in rows]
    # re-stamping rewrote rows, never duplicated them
    assert len(urls) == len(set(urls))
    # membership identical to a no-recrawl run: recrawl re-fetches, it never
    # discovers (children of a refreshed page are already members)
    base = CrawlEngine(
        spark, fix, os.path.join(os.path.dirname(_ckpt), "ck_base"),
        CrawlConfig(max_rounds=cfg.max_rounds), compact_every=2,
    )
    base.run()
    assert set(urls) == {r.url for r in base.url_seen().collect()}


def test_recrawl_rows_rank_after_new_work(spark, recrawl_run):
    eng, _summary, _fix, ckpt, _cfg = recrawl_run
    from crawler_spark.sources import snapshots as snap

    last = snap.latest_round(ckpt)
    frontier = snap.read_full(spark, ckpt, "frontier", last)
    # any pending recrawl rows carry exactly PRIORITY_RECRAWL (> child band)
    pr = {r.priority for r in frontier.filter(F.col("priority") >= PRIORITY_RECRAWL).collect()}
    assert pr <= {PRIORITY_RECRAWL}
    # trace records the recrawl resubmissions
    trace = eng.task_trace()
    assert trace.filter(F.col("state") == "recrawl").count() > 0


def test_recrawl_resume_continues_cleanly(spark, recrawl_run):
    eng, _summary, fix, ckpt, cfg = recrawl_run
    before = {(r.url, r.round) for r in eng.url_seen().collect()}
    cfg2 = CrawlConfig(max_rounds=cfg.max_rounds + 2, recrawl_ttl_rounds=3)
    eng2 = CrawlEngine(spark, fix, ckpt, cfg2, compact_every=2)
    eng2.run(resume=True)
    rows = eng2.url_seen().collect()
    urls = [r.url for r in rows]
    assert len(urls) == len(set(urls))
    # membership only grows (the extra rounds fetch pending work and may
    # admit its children); prior members all survive and stamps only move
    # forward (re-stamp refresh, never loss)
    stamp_before = dict(before)
    assert set(stamp_before) <= set(urls)
    assert all(r.round >= stamp_before.get(r.url, 0) for r in rows)
