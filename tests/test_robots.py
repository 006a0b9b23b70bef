"""robots.txt parser: RFC 9309-lite semantics + Spark ingestion roundtrip."""

import pytest

from crawler_spark.functions.robots import (
    parse_robots_txt,
    robots_table_from_bodies,
    write_robots_txt,
)


def test_basic_group():
    txt = "User-agent: *\nDisallow: /private\nCrawl-delay: 2.5\n"
    assert parse_robots_txt(txt) == (["/private"], 2.5)


def test_specific_agent_beats_star():
    txt = (
        "User-agent: *\nDisallow: /all\n\n"
        "User-agent: crawler\nDisallow: /mine\nCrawl-delay: 1\n"
    )
    assert parse_robots_txt(txt, agent="crawler-spark") == (["/mine"], 1.0)
    assert parse_robots_txt(txt, agent="otherbot") == (["/all"], None)


def test_multi_agent_group_and_comments():
    txt = (
        "# top comment\n"
        "User-agent: alpha\n"
        "User-agent: crawler\n"
        "Disallow: /a   # trailing comment\n"
        "Disallow:\n"  # empty value = allow-all, ignored
        "disallow: /b\n"  # case-insensitive key
    )
    assert parse_robots_txt(txt, agent="crawler-spark") == (["/a", "/b"], None)


@pytest.mark.parametrize("bad", [None, "", "   ", "no colons here", ":::\nxx"])
def test_malformed_never_raises(bad):
    assert parse_robots_txt(bad) == ([], None)


def test_bad_delay_and_no_matching_group():
    assert parse_robots_txt("User-agent: x\nCrawl-delay: soon\nDisallow: /q\n") == ([], None)
    txt = "User-agent: crawler\nCrawl-delay: notanumber\nDisallow: /q\n"
    assert parse_robots_txt(txt, agent="crawler-spark") == (["/q"], None)


def test_engine_raw_robots_equals_structured(spark, tmp_path):
    """A fixture whose robots.parquet holds raw bodies must crawl exactly
    like the structured one (the engine auto-ingests via the parser)."""
    import os
    import shutil

    from crawler_spark.fixtures import generate
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig

    fix = str(tmp_path / "fix")
    generate(fix, n_pages=96, n_hosts=4, seed=5)

    raw_fix = str(tmp_path / "rawfix")
    shutil.copytree(fix, raw_fix)
    structured = spark.read.parquet(os.path.join(fix, "robots.parquet")).collect()
    raw_rows = [
        (r.host, write_robots_txt(list(r.disallow_prefixes), r.crawl_delay_s))
        for r in structured
    ]
    spark.createDataFrame(raw_rows, "host string, robots_txt string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(raw_fix, "robots.parquet"))

    cfg = CrawlConfig(max_rounds=3)
    a = CrawlEngine(spark, fix, str(tmp_path / "ck_a"), cfg)
    b = CrawlEngine(spark, raw_fix, str(tmp_path / "ck_b"), cfg)
    a.run()
    b.run()
    la = sorted((r.round, r.url, r.status) for r in a.fetch_log().collect())
    lb = sorted((r.round, r.url, r.status) for r in b.fetch_log().collect())
    assert la == lb and len(la) > 0


def test_spark_ingestion_roundtrip(spark):
    """Structured → raw text → parsed-back structured must be identity; the
    NULL/garbage body rows survive as empty rules (executor safety)."""
    structured = [
        ("h0.example.com", ["/private", "/tmp"], 1.0),
        ("h1.example.com", [], 0.5),
        ("h2.example.com", ["/x"], None),
    ]
    rows = [(h, write_robots_txt(p, d)) for h, p, d in structured]
    rows += [("h3.example.com", None), ("h4.example.com", "%%% garbage ###")]
    bodies = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {
        r.host: (list(r.disallow_prefixes), r.crawl_delay_s)
        for r in robots_table_from_bodies(bodies).collect()
    }
    for h, p, d in structured:
        assert got[h] == (p, d)
    assert got["h3.example.com"] == ([], None)
    assert got["h4.example.com"] == ([], None)
