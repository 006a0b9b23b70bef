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
