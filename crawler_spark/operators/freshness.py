"""Adaptive-revisit (freshness) estimation over capture history — the
policy layer above TTL recrawl (`CrawlConfig.recrawl_ttl_rounds`) and
`warc.cdx_diff`'s two-snapshot classification.

The reference re-crawls on a fixed quartz cron (`Crawlers.java`); a
100 TB crawl cannot afford uniform revisit frequency — hot pages (news
indexes) need hourly refetch while cold ones (terms-of-service) need
yearly.  The public method is Cho & Garcia-Molina's change-frequency
estimator ("Estimating Frequency of Change", ACM TOIT 3(3), 2003): model
page change as Poisson, observe n revisit intervals of which X showed a
changed content digest, and estimate the per-interval change probability
with their bias-corrected ratio

    r_hat = -ln((n - X + 0.5) / (n + 0.5))

(consistent even though a digest comparison only reveals *whether* a page
changed within an interval, not how many times).

Input shape = the WARC sink's CDX index (``url, date/ts, digest``): every
crawl that archives through ``CrawlEngine.export_warc(cdx=True)`` over
successive snapshots accumulates exactly this history for free.

Engine-exactness discipline: the estimate is surfaced as a SCALED INTEGER
``chg_scaled = round(r_hat * 1e6)`` (BIGINT) and the ratio under the ln is
one double division of two exact integers ``(2(n-X)+1) / (2n+1)`` — the
same house rule as PageRank/HLL/DSIR, so the DuckDB twin hashes equal.
Revisit bands are integer cross-multiplications (never float thresholds).

Scale shape: one window (lag of the digest per url, ordered by capture
time) + one groupBy(url) — both shuffle on the url key, which the crawl
already partitions by; per-url capture counts are bounded by revisit
frequency (tens to thousands), so no skew beyond what host-salting
already handles upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["change_rate", "revisit_seeds"]


def change_rate(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    scale: int = 1_000_000,
    hot_num: int = 3,
    hot_den: int = 4,
    warm_num: int = 1,
    warm_den: int = 4,
) -> DataFrame:
    """Per-URL change-rate table from a capture history.

    Returns ``(url, n_caps, n_changes, span_s, mean_gap_s, chg_scaled,
    revisit_band)`` for every URL with >= 2 captures:

    * ``n_changes`` — intervals whose digest differs from the previous
      capture's (detected changes X over n = n_caps - 1 intervals);
    * ``span_s`` / ``mean_gap_s`` — integer seconds observed / per interval
      (exact ``div``, no float);
    * ``chg_scaled`` — ``round(-ln((2(n-X)+1)/(2n+1)) * scale)`` as BIGINT,
      the bias-corrected per-interval change probability;
    * ``revisit_band`` — ``hot`` when ``X*hot_den >= hot_num*n``, ``warm``
      when ``X*warm_den >= warm_num*n``, else ``cold`` — the three-speed
      revisit queue (integer-exact thresholds).

    ``ts_col`` may be a timestamp or anything castable to one.  Ties on
    capture time break by digest so the lag is a total order (two captures
    at one instant with equal digests are interchangeable anyway).
    """
    base = captures.select(
        F.col(url_col).alias("url"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp))").alias("_us"),
        F.col(digest_col).cast("string").alias("_dg"),
    # NULL url/ts/digest rows are unobservable captures: a NULL digest would
    # make BOTH adjacent lag comparisons NULL (dropped from the change sum —
    # silent undercount), and a NULL capture time cannot be ordered.  Filter
    # AFTER the timestamp cast so an uncastable ts string degrades the same
    # way.  Dropping the row means the surviving neighbors compare directly —
    # the unknown capture is treated as never having happened.
    ).filter(
        F.col("url").isNotNull() & F.col("_us").isNotNull() & F.col("_dg").isNotNull()
    )
    w = Window.partitionBy("url").orderBy("_us", "_dg")
    seq = base.select(
        "url",
        "_us",
        (F.col("_dg") != F.lag("_dg").over(w)).cast("long").alias("_chg"),
    )
    n_int = F.count("*") - 1
    n_chg = F.coalesce(F.sum("_chg"), F.lit(0))
    span_us = F.max("_us") - F.min("_us")
    agg = (
        seq.groupBy("url")
        .agg(
            F.count("*").alias("n_caps"),
            n_chg.cast("long").alias("n_changes"),
            n_int.cast("long").alias("_n"),
            span_us.alias("_span_us"),
        )
        .filter(F.col("n_caps") >= 2)
    )
    ratio = (
        (2 * (F.col("_n") - F.col("n_changes")) + 1).cast("double")
        / (2 * F.col("_n") + 1).cast("double")
    )
    chg = F.round(-F.log(ratio) * scale).cast("long")
    band = (
        F.when(F.col("n_changes") * hot_den >= hot_num * F.col("_n"), "hot")
        .when(F.col("n_changes") * warm_den >= warm_num * F.col("_n"), "warm")
        .otherwise("cold")
    )
    return agg.select(
        "url",
        "n_caps",
        "n_changes",
        F.expr("_span_us div 1000000").alias("span_s"),
        F.expr("(_span_us div _n) div 1000000").alias("mean_gap_s"),
        chg.alias("chg_scaled"),
        band.alias("revisit_band"),
    )


def revisit_seeds(rates: DataFrame, include_cold: bool = False) -> DataFrame:
    """:func:`change_rate` output → seed table for the next freshness crawl
    — the rate-driven complement of ``warc.refetch_seeds``' change-driven
    plan (that one refetches what a diff PROVED stale; this one schedules
    what the estimator PREDICTS stale).

    Hot URLs first, then warm (cold only with ``include_cold=True`` — the
    uniform-revisit trap this operator exists to avoid), descending
    ``chg_scaled`` inside each band, url as the tiebreak.  Output matches
    the fixture ``seeds.parquet`` contract (``seed_id`` = string rank the
    engine reads back as the priority key, ``story_seq`` 0, no cookies), so
    ``CrawlEngine(seeds_df=revisit_seeds(change_rate(cdx)))`` runs the
    revisit crawl directly.  Scale: one range shuffle over only the
    revisit subset (scale-safe ``global_row_number``, never a
    single-partition window).
    """
    from crawler_spark.operators.ordering import seed_contract_table

    bands = ("hot", "warm", "cold") if include_cold else ("hot", "warm")
    blk = (
        F.when(F.col("revisit_band") == "hot", 0)
        .when(F.col("revisit_band") == "warm", 1)
        .otherwise(2)
    )
    picks = rates.filter(F.col("revisit_band").isin(*bands)).select(
        "url", blk.alias("_blk"), (-F.col("chg_scaled")).alias("_nc")
    )
    return seed_contract_table(picks, ["_blk", "_nc", "url"])
