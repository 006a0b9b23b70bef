"""Per-host politeness scheduling as salted window ranking (SURVEY.md O1/T4).

The reference enforces a global 1 req/s delay per fetcher process
(reference BackLogFetcher.java:45 ``@Crawler(delay = 1)``) and FIFO order
from its Redis backlog (BackLogFetcher.java:107).  Spark-first re-expression:
each round, every host gets ``floor(round_seconds / crawl_delay)`` fetch
slots (robots.txt crawl-delay, north_rule addition) and slots are filled in
the total per-host order ``(wave, priority, url)``.

Scale design (axis B — skew):
A single ``row_number() OVER (PARTITION BY host ORDER BY …)`` puts an entire
hot host's frontier through one task.  We therefore rank in two phases:

  phase 1: rank within (host, salt) where salt = xxhash64(url) % S —
           S-way parallel; keep only the per-salt top ``budget`` rows, which
           provably contains the per-host top ``budget``.
  phase 2: exact rank within host over ≤ S × budget survivors.

Phase 2's window input is bounded by S×budget rows per host regardless of
frontier size, so the skewed window never sees the hot host's full backlog.
Budgets are per-host smallints; the robots table is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.plans.policy import DEFAULT_CRAWL_DELAY_S, CrawlConfig

__all__ = ["with_host_budget", "select_fetch_batch"]

_ORDER_COLS = ["wave", "priority", "url"]


def with_host_budget(frontier: DataFrame, robots: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Broadcast-join robots and compute the per-round per-host budget column.

    Mirrors CrawlConfig.host_budget (policy.py) as a Column expression.
    """
    rb = F.broadcast(robots.select("host", "crawl_delay_s"))
    delay = F.coalesce(F.col("crawl_delay_s"), F.lit(DEFAULT_CRAWL_DELAY_S))
    budget = (
        F.when(delay <= 0, F.lit(cfg.max_burst_per_host))
        .otherwise(
            F.greatest(
                F.lit(1),
                F.least(
                    F.lit(cfg.max_burst_per_host),
                    F.floor(F.lit(cfg.round_seconds) / delay).cast("int"),
                ),
            )
        )
        .cast("int")
    )
    return frontier.join(rb, "host", "left").withColumn("budget", budget).drop("crawl_delay_s")


def select_fetch_batch(frontier: DataFrame, robots: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Return this round's fetch batch with an exact per-host ``rank``.

    Input must carry (url, host, wave, priority).  Output = input columns +
    ``rank`` (1-based within host, dense FIFO order), filtered to the budget.
    """
    budgeted = with_host_budget(frontier, robots, cfg)

    # phase 1 — salted pre-top-k (bounds the exact window under skew)
    salted = budgeted.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_buckets)).cast("int")
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*[F.col(c).asc() for c in _ORDER_COLS])
    pre = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("budget"))
        .drop("_r1", "_salt")
    )

    # phase 2 — exact per-host rank over the bounded survivor set
    w2 = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in _ORDER_COLS])
    return (
        pre.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= F.col("budget"))
        .drop("budget")
    )
