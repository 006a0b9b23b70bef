"""WET/WAT derived archives (operators/warc.py write_wet / write_wat).

Pins: Common Crawl naming (``*.warc.wet.gz`` / ``*.warc.wat.gz``),
``conversion``/``metadata`` record types, WARC-Refers-To content addressing
back to the original ``resource`` record, WET text == the K2 sink's
canonical tag-strip, WAT JSON envelope (title + ordered-distinct links),
byte-identical re-runs, and the engine's crawl→WET/WAT handoff.
"""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.warc import (
    html_title_links,
    read_warc,
    write_warc,
    write_wat,
    write_wet,
)


def _pages(spark, n=60):
    return spark.range(n).select(
        F.concat(F.lit("http://h"), (F.col("id") % 4),
                 F.lit(".example/p/"), F.col("id")).alias("url"),
        F.concat(
            F.lit("<html><head><title>Page "), F.col("id"),
            F.lit("</title></head><body><p>body "), F.col("id"),
            F.lit("</p><a href='/p/"), (F.col("id") + 1),
            F.lit("'>next</a><a href='/p/"), (F.col("id") + 1),
            F.lit("'>dup</a><a href='/p/"), (F.col("id") + 2),
            F.lit("'>skip</a></body></html>"),
        ).alias("payload"),
        (F.lit(1704067200.0) + F.col("id").cast("double")).alias("epoch"),
    )


def test_html_title_links():
    title, links = html_title_links(
        "<html><head><title> T </title></head><body>"
        "<a href='/a'>1</a><a href='/b'>2</a><a href='/a'>again</a>"
        "<a>no-href</a></body></html>")
    assert title == "T"
    assert links == ["/a", "/b"]  # document order, first occurrence wins
    assert html_title_links(None) == ("", [])
    assert html_title_links("<not <valid") == ("", [])


def test_wet_roundtrip_and_refers_to(spark, tmpdir_path):
    from crawler_spark.operators.exporters import strip_tags_line

    warc_out = os.path.join(tmpdir_path, "warc")
    wet_out = os.path.join(tmpdir_path, "wet")
    write_warc(_pages(spark), warc_out, 3)
    m = write_wet(_pages(spark), wet_out, 3)
    assert m["n_records"] == 60 and m["ext"] == ".warc.wet.gz"
    assert all(f"wet-{s['file']:06d}.warc.wet.gz" in os.listdir(wet_out)
               for s in m["files"])

    html = {r.url: (r.payload, r.epoch) for r in _pages(spark).collect()}
    recs = read_warc(spark, wet_out).collect()
    conv = [r for r in recs if r.warc_type == "conversion"]
    assert len(conv) == 60
    # WET text is exactly the canonical tag-strip of the page HTML
    for r in conv:
        assert bytes(r.payload).decode() == strip_tags_line(html[r.target_uri][0])
        assert r.content_type == "text/plain"
    # WARC-Refers-To resolves to a real record id in the resource archive:
    # content-addressed ids make the link checkable without offsets
    resource_ids = {r.record_id for r in read_warc(spark, warc_out).collect()
                    if r.warc_type == "resource"}

    def refers_to(path):
        from crawler_spark.operators.warc import parse_warc_stream
        with open(path, "rb") as f:
            return [rec.get("warc-refers-to")
                    for rec in parse_warc_stream(f.read())
                    if rec.get("warc-type") == "conversion"]

    refs = [x for s in m["files"]
            for x in refers_to(os.path.join(
                wet_out, f"wet-{s['file']:06d}.warc.wet.gz"))]
    assert len(refs) == 60 and set(refs) == resource_ids


def test_wat_envelope(spark, tmpdir_path):
    out = os.path.join(tmpdir_path, "wat")
    m = write_wat(_pages(spark), out, 2)
    assert m["ext"] == ".warc.wat.gz" and m["n_records"] == 60
    recs = [r for r in read_warc(spark, out).collect()
            if r.warc_type == "metadata"]
    assert len(recs) == 60
    for r in recs:
        env = json.loads(bytes(r.payload).decode())["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == r.target_uri
        assert env["WARC-Header-Metadata"]["WARC-Date"] == r.date
        hm = env["Payload-Metadata"]["HTML-Metadata"]
        i = int(r.target_uri.rsplit("/", 1)[1])
        assert hm["Head"]["Title"] == f"Page {i}"
        # fixture links: /p/{i+1} twice (deduped) then /p/{i+2}
        assert [l["url"] for l in hm["Links"]] == [f"/p/{i + 1}", f"/p/{i + 2}"]
        assert r.content_type == "application/json"


@pytest.mark.parametrize("writer", [write_wet, write_wat])
def test_byte_identical_reruns(spark, tmpdir_path, writer):
    outs = [os.path.join(tmpdir_path, d) for d in ("a", "b")]
    ms = [writer(_pages(spark, 40), o, 2) for o in outs]
    assert ms[0] == ms[1]
    for s in ms[0]["files"]:
        name = f"{ms[0]['prefix']}-{s['file']:06d}{ms[0]['ext']}"
        h = []
        for o in outs:
            with open(os.path.join(o, name), "rb") as f:
                h.append(hashlib.md5(f.read()).hexdigest())
        assert h[0] == h[1] == s["md5"]


def test_engine_export_wet_wat(spark, tmp_path_factory):
    """Crawl → WET/WAT handoff mirrors export_warc's capture set."""
    from crawler_spark.fixtures import generate
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig

    fix = str(tmp_path_factory.mktemp("wet_fix"))
    generate(fix, n_pages=64, n_hosts=4, seed=11)
    eng = CrawlEngine(spark, fix, str(tmp_path_factory.mktemp("wet_ckpt")),
                      CrawlConfig(max_rounds=6))
    eng.run()
    wet_m = eng.export_wet(str(tmp_path_factory.mktemp("wet_out")), n_files=2)
    wat_m = eng.export_wat(str(tmp_path_factory.mktemp("wat_out")), n_files=2)
    warc_m = eng.export_warc(str(tmp_path_factory.mktemp("warc_out")),
                             n_files=2)
    assert wet_m["n_records"] == wat_m["n_records"] == warc_m["n_records"] > 0
