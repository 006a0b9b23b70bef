"""Anchor-text aggregation — the per-target link-text profile of a crawl.

The classic crawl-derived ranking/captioning signal (what Common Crawl ships
in its host/web-graph releases and WAT sidecar, and what LAION-style
image+caption pipelines mine as weak captions): for every URL the crawl saw
linked, the texts other pages used to link to it, with counts and the
breadth of linking hosts.

Scale design:
* ``anchor_pairs`` is a map-only Arrow pass (``mapInPandas``) over the
  archived pages — each page parsed ONCE with the crawl extractor's
  forgiving DOM builder, hrefs resolved against the page URL by the SAME
  ``prepare_url`` normalizer the frontier uses (so anchor targets join
  exactly against ``url_seen`` membership).  Per page, identical
  ``(href, text)`` pairs dedup locally (nav bars repeat within a page; the
  cross-page repetition is the signal) — so output rows are bounded by
  distinct links per page, never by tag count.
* ``anchor_text_table`` is two aggregations sharing one shuffle key
  (``target_url``): pair counts, then a per-target ``sort_array`` of the
  top-``k`` ``(count DESC, text ASC)`` structs — the cap is applied by
  slicing the sorted array, NOT by a global window, so no single-partition
  ordering ever exists and per-target state is O(distinct texts), capped.
  Distinct linking hosts ride the same shuffled key as a second agg.

No reference analog (the reference crawler extracts hrefs for the frontier,
reference Crawlers.java:271-311, but never aggregates anchor text); this is
a north-rule crawl-product addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anchor_pairs", "anchor_text_table"]


def anchor_pairs(
    pages: DataFrame, url_col: str = "url", payload_col: str = "content"
) -> DataFrame:
    """One row per distinct ``(page, resolved target, anchor text)``.

    Columns: ``src_url, src_host, target_url, anchor_text``.  Whitespace in
    anchor text collapses to single spaces (display semantics); hrefs with a
    non-http(s) scheme (javascript:, mailto:, data:, tel:) and hrefs whose
    resolved target does not parse as a URL are dropped — they are not
    in-links; empty text is kept as '' (image/icon links are real in-links
    even without text).
    """
    out_schema = (
        "src_url string, src_host string, target_url string, anchor_text string"
    )

    def _parse(it):
        import re

        import pandas as pd

        from crawler_spark.functions.extract import (
            _descendants, node_text, parse_html,
        )
        from crawler_spark.functions.urlnorm import java_url_parse, prepare_url

        # RFC 3986 scheme ahead of the resolve: javascript:/mailto:/data:/
        # tel: anchors are UI actions, not in-links — prepare_url (the
        # reference quirk replica) would otherwise splice them into garbage
        # targets that the profile table counts as real pages
        scheme_re = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")

        for pdf in it:
            src, shost, tgt, txt = [], [], [], []
            for u, body in zip(pdf[url_col], pdf[payload_col]):
                if not isinstance(u, str):
                    continue
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", errors="replace")
                if not isinstance(body, str):
                    continue
                parsed = java_url_parse(u)
                host = parsed.host if parsed else ""
                seen = set()
                for n in _descendants(parse_html(body)):
                    if n.tag != "a":
                        continue
                    href = n.attrs.get("href")
                    if not href:
                        continue
                    m = scheme_re.match(href)
                    if m and m.group(0).lower() not in ("http:", "https:"):
                        continue
                    target = prepare_url(u, href)
                    if java_url_parse(target) is None:
                        continue  # resolve produced a non-URL: not an in-link
                    text = " ".join(node_text(n).split())
                    if (target, text) in seen:
                        continue
                    seen.add((target, text))
                    src.append(u)
                    shost.append(host)
                    tgt.append(target)
                    txt.append(text)
            yield pd.DataFrame(
                {"src_url": src, "src_host": shost,
                 "target_url": tgt, "anchor_text": txt}
            )

    return pages.select(url_col, payload_col).mapInPandas(_parse, schema=out_schema)


def anchor_text_table(
    pages: DataFrame,
    url_col: str = "url",
    payload_col: str = "content",
    top_k: int = 8,
) -> DataFrame:
    """Per-target anchor profile over archived pages.

    Columns: ``target_url, n_inlinks`` (distinct (page, text) incidences),
    ``n_src_hosts`` (distinct linking hosts), ``top_anchors``
    (array<struct<anchor_text,cnt>>, the ``top_k`` texts by
    ``(cnt DESC, text ASC)`` — a deterministic pure function of the crawl).
    """
    # checkpoint once: the per-text and per-host aggregations shuffle on
    # DIFFERENT keys, so Spark cannot share their exchange — uncached, the
    # expensive full-HTML parse pass would run twice per action
    pairs = anchor_pairs(pages, url_col, payload_col).localCheckpoint(eager=True)
    per_text = (
        pairs.groupBy("target_url", "anchor_text")
        .agg(F.count("*").alias("cnt"))
    )
    # sort_array on struct(-cnt, text) orders count-desc then text-asc;
    # slice applies the cap after the per-target array exists — per-target
    # distinct texts are page-vocabulary-bounded, and the cap keeps the
    # OUTPUT row width fixed for downstream joins.
    top = (
        per_text.groupBy("target_url")
        .agg(
            F.sum("cnt").alias("n_inlinks"),
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("cnt")).alias("_neg"),
                            F.col("anchor_text").alias("anchor_text"),
                            F.col("cnt").alias("cnt"),
                        )
                    )
                ),
                1,
                top_k,
            ).alias("_top"),
        )
        .select(
            "target_url",
            "n_inlinks",
            F.transform(
                F.col("_top"),
                lambda s: F.struct(
                    s["anchor_text"].alias("anchor_text"), s["cnt"].alias("cnt")
                ),
            ).alias("top_anchors"),
        )
    )
    hosts = (
        pairs.groupBy("target_url")
        .agg(F.countDistinct("src_host").alias("n_src_hosts"))
    )
    return top.join(hosts, "target_url").select(
        "target_url", "n_inlinks", "n_src_hosts", "top_anchors"
    )
