"""Proxy-pool family S5/J6/A5/T5 (SURVEY.md §2).

The reference maintains a Redis map ``crawler.proxypool`` refreshed from an
IP-list URL every 30 s (S5/T5, DynamicIpPoolChecker.java:77-154), picks a
random member per fetch (J6, BackLogFetcher.java:292-318), and evicts
anti-reported proxies only while the pool holds at least ``minsize`` (10)
entries (A5, DynamicIpPoolChecker.java:171-176).

Spark-first: the pool is a tiny DataFrame (ip, idx) kept by the round driver
and BROADCAST into any join that needs it; the random pick becomes the
url-keyed md5 pick ``pool[proxy_index(url, n)]`` (plans.policy.proxy_index —
the reference uses ``RandomUtils.nextInt``; made deterministic for
reproducibility, documented deviation per SURVEY §2.3 J6, and md5-derived so
the golden simulator picks identically).  Refresh/evict rebuild the small
DataFrame — per-round broadcast refresh is the T5 analog of the 30 s
scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["parse_pool_text", "pool_df", "assign_proxy", "evict_anti", "refresh_pool"]

MIN_POOL_SIZE = 10  # proxypool.minsize (crawler-proxypool application.properties:30)


def parse_pool_text(text: str) -> list[str]:
    """IP-list body → pool entries: split lines, drop blanks
    (DynamicIpPoolChecker.java:125-154 splits the fetched list per line)."""
    return [ln.strip() for ln in text.replace("\r\n", "\n").split("\n") if ln.strip()]


def pool_df(spark: SparkSession, ips: list[str]) -> DataFrame:
    """(ip, idx) pool table; idx is the pick key (dense 0..n-1, sorted for
    determinism)."""
    rows = [(ip,) for ip in sorted(set(ips))]
    df = spark.createDataFrame(rows, "ip string")
    # unpartitioned window is safe ONLY because the pool is broadcast-sized
    # (≤ hundreds of IPs, DynamicIpPoolChecker's whole map fits one batch)
    w = Window.orderBy("ip")
    return df.withColumn("idx", F.row_number().over(w) - 1)


def assign_proxy(
    batch: DataFrame, pool: DataFrame, url_col: str = "url", n: int | None = None
) -> DataFrame:
    """J6: deterministic per-URL pick — broadcast-join the pool on the
    md5-derived index (policy.proxy_index's exact Spark mirror, so the golden
    simulator and any SQL twin reproduce the pick); an empty pool assigns
    NULL (direct fetch).  Pass ``n`` (the pool size) when known to skip the
    count job — the engine calls this every round."""
    if n is None:
        n = pool.count()
    if n == 0:
        return batch.withColumn("proxy_ip", F.lit(None).cast("string"))
    idx = F.pmod(
        F.conv(F.substring(F.md5(F.col(url_col)), 1, 15), 16, 10).cast("long"), F.lit(n)
    ).cast("int")
    keyed = batch.withColumn("idx", idx)
    return (
        keyed.join(F.broadcast(pool.withColumnRenamed("ip", "proxy_ip")), "idx", "left")
        .drop("idx")
    )


def evict_anti(pool: DataFrame, anti_ips: DataFrame, min_size: int = MIN_POOL_SIZE) -> DataFrame:
    """A5: evict anti-reported proxies, but never shrink below ``min_size``
    (DynamicIpPoolChecker.java:171-176 checks size before each delete).

    Deterministic batch analog: evict at most ``pool_size - min_size``
    reported ips, in sorted order."""
    n = pool.count()
    n_evictable = max(0, n - min_size)
    if n_evictable == 0:
        return pool
    to_evict = (
        pool.join(anti_ips.select(F.col(anti_ips.columns[0]).alias("ip")).distinct(), "ip")
        .orderBy("ip")
        .limit(n_evictable)
        .select("ip")
    )
    kept = pool.join(to_evict, "ip", "left_anti").select("ip")
    return pool_df(pool.sparkSession, [r["ip"] for r in kept.collect()])


def refresh_pool(spark: SparkSession, text: str) -> DataFrame:
    """T5: full refresh from a newly fetched IP list (the reference replaces
    the pool map after 5 idle checks / every 30 s scheduler tick)."""
    return pool_df(spark, parse_pool_text(text))
