"""Spider-trap detection: hosts whose URL space explodes through a handful
of path templates (calendar pages, session ids, faceted search) — the
classic crawler pathology at frontier scale, where one trap host can eat a
politeness-bounded crawl's whole budget.

Heuristic (the one production crawlers ship: Heritrix's PathologicalPath /
TooManyPathSegments rules are per-URL forms of the same signal): collapse
every digit run in the URL path to a placeholder, count DISTINCT URLs per
(host, template) — a bounded site yields bounded distinct URLs per template
no matter how often it is re-crawled, a trap yields distinct URLs linear in
crawl effort.  Flag hosts whose largest template exceeds a budget.

Plan shape: two partial-aggregated shuffles, both on keys that shrink the
data (host+template+url dedup, then host) — no join, no window.  At 10¹⁰
URLs the first groupBy is the only heavy one and it is exactly the
url_seen-dedup shape the engine already runs.

Reference tie-in: the reference's anti-crawl predicate (P3,
``StoryWorker.java`` alert keywords) blocks per-page; trap detection is the
host-level complement this engine adds for frontier-scale crawls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["trap_hosts", "url_path_template"]


def url_path_template(url: Column) -> Column:
    """URL path with every digit run collapsed to ``{n}``.

    ``/cal/2024/11/30`` and ``/cal/1999/1/1`` → ``/cal/{n}/{n}/{n}`` — the
    template under which trap URL spaces collapse.  NULL, malformed, and
    path-less URLs degrade to the empty template — ``try_parse_url``, never
    an executor raise.  Pure JVM expression (the regex is in the Java∩RE2
    subset: one character-class quantifier), zero shuffle.
    """
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    return F.regexp_replace(path, "[0-9]+", "{n}")


def trap_hosts(
    urls: DataFrame, url_col: str = "url", max_urls_per_template: int = 100,
) -> DataFrame:
    """Per-host template-explosion profile over a URL table.

    Returns one row per host: ``n_urls`` (distinct URLs), ``n_templates``
    (distinct collapsed path templates), ``max_template_urls`` (distinct
    URLs under the host's largest template), and ``trap`` — true when that
    largest template exceeds ``max_urls_per_template``.  Feed flagged hosts
    to the crawl policy as disallow/deprioritize entries.
    """
    d = urls.select(
        F.col(url_col).alias("url"),
        F.try_parse_url(F.col(url_col), F.lit("HOST")).alias("host"),
        url_path_template(F.col(url_col)).alias("template"),
    ).filter(F.col("host").isNotNull())
    per_template = d.groupBy("host", "template").agg(
        F.countDistinct("url").alias("n_urls")
    )
    return per_template.groupBy("host").agg(
        F.sum("n_urls").cast("long").alias("n_urls"),
        F.count("*").alias("n_templates"),
        F.max("n_urls").alias("max_template_urls"),
    ).withColumn("trap", F.col("max_template_urls") > max_urls_per_template)
