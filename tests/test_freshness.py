"""Unit tests for the adaptive-revisit change-rate operator
(operators/freshness.py): brute-force equality against an independent
Python replica of the Cho & Garcia-Molina estimator, band thresholds,
and the >= 2-captures contract.  The SQL twin (q71) is checked in
test_oracle_equivalence."""

import math
from datetime import datetime

from crawler_spark.operators.freshness import change_rate


def _caps_df(spark, rows):
    return spark.createDataFrame(rows, ["url", "ts", "digest"])


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _brute(rows):
    by_url = {}
    for url, ts, dg in rows:
        by_url.setdefault(url, []).append((ts, dg))
    out = {}
    for url, caps in by_url.items():
        if len(caps) < 2:
            continue
        caps.sort()
        n = len(caps) - 1
        x = sum(1 for a, b in zip(caps, caps[1:]) if a[1] != b[1])
        span = int((caps[-1][0] - caps[0][0]).total_seconds() * 1_000_000)
        chg = round(-math.log((2 * (n - x) + 1) / (2 * n + 1)) * 1_000_000)
        band = (
            "hot" if x * 4 >= 3 * n else "warm" if x * 4 >= n else "cold"
        )
        out[url] = (
            len(caps), x, span // 1_000_000, (span // n) // 1_000_000,
            chg, band,
        )
    return out


def test_change_rate_matches_brute_force(spark):
    rows = [
        # every interval changes -> hot
        ("a", _ts(0), "1"), ("a", _ts(10), "2"), ("a", _ts(25), "3"),
        # never changes -> cold, chg_scaled from the 0.5 bias floor
        ("b", _ts(0), "x"), ("b", _ts(30), "x"), ("b", _ts(50), "x"),
        # 1 change over 3 intervals -> warm (4*1 >= 3)
        ("c", _ts(0), "1"), ("c", _ts(5), "1"),
        ("c", _ts(9), "2"), ("c", _ts(20), "2"),
        # single capture -> filtered out
        ("d", _ts(7), "z"),
    ]
    got = {
        r.url: (
            r.n_caps, r.n_changes, r.span_s, r.mean_gap_s,
            r.chg_scaled, r.revisit_band,
        )
        for r in change_rate(_caps_df(spark, rows)).collect()
    }
    assert got == _brute(rows)
    assert got["a"][5] == "hot"
    assert got["b"][5] == "cold"
    assert got["c"][5] == "warm"
    assert "d" not in got


def test_change_rate_drops_null_captures(spark):
    """A NULL digest/ts/url row is an unobservable capture: it must be
    dropped BEFORE the lag, so the surviving neighbors compare directly —
    not silently undercount via NULL != comparisons."""
    clean = [
        ("a", _ts(0), "1"), ("a", _ts(10), "2"), ("a", _ts(25), "3"),
        ("b", _ts(0), "x"), ("b", _ts(30), "x"),
    ]
    dirty = clean + [
        ("a", _ts(5), None),        # NULL digest mid-history
        ("b", None, "y"),           # NULL capture time
        (None, _ts(1), "z"),        # NULL url
    ]
    def run(rows):
        return {
            r.url: (r.n_caps, r.n_changes, r.chg_scaled, r.revisit_band)
            for r in change_rate(_caps_df(spark, rows)).collect()
        }
    assert run(dirty) == run(clean)


def test_change_rate_estimator_is_monotone_in_changes(spark):
    """More detected changes over the same interval count must never yield
    a smaller rate estimate (the estimator's defining property)."""
    rows = []
    for x in range(5):  # url f{x} has x changes over 4 intervals
        digs = ["0"] * (5 - x) + [str(i + 1) for i in range(x)]
        rows += [(f"f{x}", _ts(10 * i), d) for i, d in enumerate(digs)]
    got = {
        r.url: r.chg_scaled for r in change_rate(_caps_df(spark, rows)).collect()
    }
    rates = [got[f"f{x}"] for x in range(5)]
    assert rates == sorted(rates) and len(set(rates)) == 5


def test_revisit_seeds_contract_and_ordering(spark):
    """Hot before warm, descending rate inside a band, cold excluded by
    default; column contract identical to warc.refetch_seeds so the engine
    accepts either plan as seeds_df."""
    from crawler_spark.operators.freshness import revisit_seeds
    from crawler_spark.operators.warc import refetch_seeds

    rates = spark.createDataFrame(
        [
            ("w-lo", 5, 1, 100, 25, 200_000, "warm"),
            ("hot-a", 5, 4, 100, 25, 1_600_000, "hot"),
            ("cold-x", 5, 0, 100, 25, 50_000, "cold"),
            ("hot-b", 5, 3, 100, 25, 1_000_000, "hot"),
            ("w-hi", 5, 2, 100, 25, 500_000, "warm"),
        ],
        ["url", "n_caps", "n_changes", "span_s", "mean_gap_s",
         "chg_scaled", "revisit_band"],
    )
    rows = sorted(revisit_seeds(rates).collect(), key=lambda r: int(r.seed_id))
    assert [r.url for r in rows] == ["hot-a", "hot-b", "w-hi", "w-lo"]
    assert [r.seed_id for r in rows] == ["0", "1", "2", "3"]
    assert all((r.story_seq, r.cookies) == (0, "") for r in rows)

    with_cold = revisit_seeds(rates, include_cold=True).collect()
    assert len(with_cold) == 5
    assert max(with_cold, key=lambda r: int(r.seed_id)).url == "cold-x"

    diff = spark.createDataFrame(
        [("u", "changed", "d1", "g1", "d2", "g2")],
        ["url", "status", "old_date", "old_digest", "new_date", "new_digest"],
    )
    assert revisit_seeds(rates).schema == refetch_seeds(diff).schema


def test_change_rate_accepts_cdx_index_shape(spark):
    """The operator consumes the WARC sink's CDX index directly: string
    'date' capture times and sha1-base32 digests."""
    rows = [
        ("http://h0/p", "2024-01-01 00:00:00", "AAAA"),
        ("http://h0/p", "2024-01-02 00:00:00", "BBBB"),
        ("http://h0/p", "2024-01-03 00:00:00", "BBBB"),
    ]
    df = spark.createDataFrame(rows, ["url", "date", "digest"])
    (row,) = change_rate(df, ts_col="date").collect()
    assert (row.n_caps, row.n_changes, row.revisit_band) == (3, 1, "warm")
    assert row.span_s == 2 * 86400 and row.mean_gap_s == 86400


def test_revisit_loop_end_to_end(spark, tmp_path_factory):
    """Close the freshness loop on REAL engine state: two archived crawls
    (one page mutated between them) → union of their CDX indexes →
    change_rate flags exactly the mutated URL as non-cold → revisit_seeds
    plans it → a crawl driven by that plan refetches it."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from crawler_spark.fixtures import generate
    from crawler_spark.operators.freshness import revisit_seeds
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig, ST_FETCHED

    fix = str(tmp_path_factory.mktemp("fresh_fix"))
    generate(fix, n_pages=64, n_hosts=4, seed=11)

    def crawl(fd, tag):
        ck = str(tmp_path_factory.mktemp(f"fresh_ck_{tag}"))
        eng = CrawlEngine(spark, fd, ck, CrawlConfig(max_rounds=6))
        eng.run()
        out = str(tmp_path_factory.mktemp(f"fresh_warc_{tag}"))
        eng.export_warc(out, n_files=2)
        return spark.read.parquet(os.path.join(out, "cdx"))

    cdx0 = crawl(fix, "c0")
    target = min(r.url for r in cdx0.select("url").collect())

    fix2 = str(tmp_path_factory.mktemp("fresh_fix2"))
    shutil.copytree(fix, fix2, dirs_exist_ok=True)
    tbl = pq.read_table(os.path.join(fix2, "pages.parquet"))
    content = [
        c + "<!-- v2 -->" if u == target else c
        for u, c in zip(tbl["url"].to_pylist(), tbl["content"].to_pylist())
    ]
    pq.write_table(
        tbl.set_column(tbl.schema.get_field_index("content"), "content",
                       pa.array(content, pa.string())),
        os.path.join(fix2, "pages.parquet"))
    cdx1 = crawl(fix2, "c1")

    caps = (
        cdx0.select("url", "date", "digest")
        .unionByName(cdx1.select("url", "date", "digest"))
    )
    rates = change_rate(caps, ts_col="date")
    non_cold = {r.url: r.revisit_band
                for r in rates.filter(F.col("revisit_band") != "cold").collect()}
    assert set(non_cold) == {target}  # 1 change / 1 interval -> hot
    assert non_cold[target] == "hot"

    seeds = revisit_seeds(rates)
    assert [(r.seed_id, r.url) for r in seeds.collect()] == [("0", target)]

    eng2 = CrawlEngine(spark, fix2, str(tmp_path_factory.mktemp("fresh_ck2")),
                       CrawlConfig(max_rounds=1), seeds_df=seeds)
    eng2.run()
    refetched = {r.url for r in eng2.fetch_log()
                 .filter(F.col("status") == ST_FETCHED).select("url").collect()}
    assert target in refetched
