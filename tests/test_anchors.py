"""Anchor-text aggregation (operators/anchors.py) + engine anchor_report.

Pins: href resolution through the frontier's own prepare_url, per-page
(href, text) dedup, whitespace collapse, byte payload tolerance, the
(count DESC, text ASC) top-k ordering as an exact brute-force equality,
and crawl targets joining back against url_seen membership.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from crawler_spark.operators.anchors import anchor_pairs, anchor_text_table


def _pages_df(spark, rows):
    return spark.createDataFrame(rows, ["url", "content"])


def test_anchor_pairs_resolution_and_dedup(spark):
    html = (
        "<html><body>"
        "<a href='/rel'>  spaced   text </a>"
        "<a href='http://other.example/x'>abs</a>"
        "<a href='/rel'>  spaced   text </a>"   # same (href,text): dedup
        "<a href='/rel'>different</a>"          # same href, new text: keep
        "<a>no href</a>"
        "<a href='/img'><img src='i.png'/></a>"  # empty text kept
        "</body></html>"
    )
    df = _pages_df(spark, [("http://h0.example/p/1", html)])
    rows = sorted(
        (r["target_url"], r["anchor_text"], r["src_host"])
        for r in anchor_pairs(df).collect()
    )
    assert rows == [
        ("http://h0.example/img", "", "h0.example"),
        ("http://h0.example/rel", "different", "h0.example"),
        ("http://h0.example/rel", "spaced text", "h0.example"),
        ("http://other.example/x", "abs", "h0.example"),
    ]


def test_anchor_pairs_tolerates_binary_and_malformed(spark):
    df = spark.createDataFrame(
        [
            ("http://h.example/a", b"<a href='/t'>bin body</a>"),
            ("http://h.example/b", b"<not <valid <a href='/t'>x"),
            ("http://h.example/c", None),
        ],
        "url string, content binary",
    )
    # binary payloads decode; malformed HTML yields a partial tree (never
    # raises); NULL body contributes nothing
    out = anchor_pairs(df).collect()
    assert ("http://h.example/t", "bin body") in {
        (r["target_url"], r["anchor_text"]) for r in out
    }


def _corpus(spark):
    rows = []
    for i in range(24):
        host = f"h{i % 3}.example"
        links = []
        # heavy target: linked from every page, two competing texts
        links.append(("<a href='http://hot.example/'>%s</a>"
                      % ("hot" if i % 2 else "HOT page")))
        # medium target: every third page
        if i % 3 == 0:
            links.append("<a href='/local'>local thing</a>")
        # self-link chain
        links.append(f"<a href='/p/{i + 1}'>next {i + 1}</a>")
        rows.append((f"http://{host}/p/{i}",
                     "<html><body>" + "".join(links) + "</body></html>"))
    return rows


def test_anchor_text_table_equals_bruteforce(spark):
    rows = _corpus(spark)
    df = _pages_df(spark, rows)
    got = {r["target_url"]: r for r in anchor_text_table(df, top_k=2).collect()}

    # brute force over the same parse contract
    pair_rows = [
        (r["target_url"], r["anchor_text"], r["src_host"])
        for r in anchor_pairs(df).collect()
    ]
    cnt = Counter((t, a) for t, a, _h in pair_rows)
    hosts = defaultdict(set)
    for t, _a, h in pair_rows:
        hosts[t].add(h)
    targets = {t for t, _a in cnt}
    assert set(got) == targets
    for t in targets:
        texts = sorted(
            ((a, c) for (tt, a), c in cnt.items() if tt == t),
            key=lambda ac: (-ac[1], ac[0]),
        )
        r = got[t]
        assert r["n_inlinks"] == sum(c for _a, c in texts)
        assert r["n_src_hosts"] == len(hosts[t])
        assert [(s["anchor_text"], s["cnt"]) for s in r["top_anchors"]] == texts[:2]


def test_anchor_text_table_deterministic(spark):
    df = _pages_df(spark, _corpus(spark))
    a = sorted(map(str, anchor_text_table(df, top_k=3).collect()))
    b = sorted(map(str, anchor_text_table(df, top_k=3).collect()))
    assert a == b


def test_engine_anchor_report_joins_url_seen(spark, tmp_path_factory):
    """Crawl → anchor profile: targets are frontier-normalized, so the
    crawl's own fetched URLs appear as anchor targets."""
    from crawler_spark.fixtures import generate
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig

    fix = str(tmp_path_factory.mktemp("anchor_fix"))
    generate(fix, n_pages=48, n_hosts=4, seed=13)
    eng = CrawlEngine(spark, fix, str(tmp_path_factory.mktemp("anchor_ckpt")),
                      CrawlConfig(max_rounds=5))
    eng.run()
    rep = eng.anchor_report(top_k=4)
    rows = rep.collect()
    assert rows, "crawl produced no anchor profile"
    seen = {r["url"] for r in eng.url_seen().select("url").collect()}
    overlap = [r for r in rows if r["target_url"] in seen]
    assert overlap, "no anchor target matched url_seen membership"
    for r in rows:
        assert r["n_inlinks"] >= r["top_anchors"][0]["cnt"] >= 1
        assert 1 <= r["n_src_hosts"]
        texts = [(s["anchor_text"], s["cnt"]) for s in r["top_anchors"]]
        assert texts == sorted(texts, key=lambda ac: (-ac[1], ac[0]))

    # weak-caption mining rides the same crawl: every mined row names a
    # real image payload and a non-empty most-supported anchor text
    caps = eng.weak_captions().collect()
    assert caps, "crawl mined no weak captions"
    img_ids = {r["image_id"] for r in
               eng.images.select("image_id").collect()}
    for r in caps:
        assert r["image_id"] in img_ids
        assert r["weak_caption"]
        assert 1 <= r["caption_support"] <= r["n_inlinks"]


def test_anchor_pairs_drops_non_web_schemes_and_unresolvable(spark):
    """javascript:/mailto:/data:/tel: anchors are UI actions, not in-links;
    a resolved target that does not parse as a URL is dropped too — the
    profile table must not carry phantom targets."""
    html = (
        "<html><body>"
        "<a href='javascript:void(0)'>js</a>"
        "<a href='mailto:x@example.com'>mail</a>"
        "<a href='data:text/plain,hi'>data</a>"
        "<a href='tel:+15551234'>tel</a>"
        "<a href='HTTP://other.example/up'>case-scheme kept</a>"
        "<a href='/ok'>kept</a>"
        "</body></html>"
    )
    df = _pages_df(spark, [("http://h0.example/p", html)])
    rows = sorted(r["target_url"] for r in anchor_pairs(df).collect())
    assert rows == ["HTTP://other.example/up", "http://h0.example/ok"]
