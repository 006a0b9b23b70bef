"""WARC archival sink + source (operators/warc.py, WARC/1.1 / ISO 28500).

Pins: spec framing (version line, required named fields, CRLF discipline,
warcinfo lead record), gzip-per-record member layout, sha1-base32 payload
digests, byte-identical re-runs, the tolerant reader on torn files, and the
engine's crawl→archive handoff.
"""

import hashlib
import os
import zlib

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.warc import (
    parse_warc_stream,
    read_warc,
    warc_record_bytes,
    write_warc,
)


def _pages(spark, n=120):
    return spark.range(n).select(
        F.concat(F.lit("http://h"), (F.col("id") % 5),
                 F.lit(".example/p/"), F.col("id")).alias("url"),
        F.concat(F.lit("<html><body>page "), F.col("id"),
                 F.lit("</body></html>")).alias("payload"),
        (F.lit(1704067200.0) + F.col("id").cast("double")).alias("epoch"),
    )


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(spark, tmpdir_path, gz):
    out = os.path.join(tmpdir_path, "warc")
    m = write_warc(_pages(spark), out, 4, gzip_records=gz)
    assert m["n_records"] == 120
    ext = ".warc.gz" if gz else ".warc"
    assert all(f"archive-{s['file']:06d}{ext}" in os.listdir(out)
               for s in m["files"])
    got = read_warc(spark, out).collect()
    res = [r for r in got if r.warc_type == "resource"]
    infos = [r for r in got if r.warc_type == "warcinfo"]
    assert len(res) == 120 and len(infos) == len(m["files"])
    assert all(r.digest_ok for r in got)
    want = {r.url: r.payload for r in _pages(spark).collect()}
    for r in res:
        assert bytes(r.payload).decode() == want[r.target_uri]
        assert r.content_type == "text/html"
        assert r.date.endswith("Z") and r.record_id.startswith("<urn:uuid:")


def test_byte_identical_reruns(spark, tmpdir_path):
    outs = [os.path.join(tmpdir_path, d) for d in ("a", "b")]
    ms = [write_warc(_pages(spark, 80), o, 3) for o in outs]
    assert ms[0] == ms[1]
    for s in ms[0]["files"]:
        name = f"archive-{s['file']:06d}.warc.gz"
        with open(os.path.join(outs[0], name), "rb") as fa, \
                open(os.path.join(outs[1], name), "rb") as fb:
            assert fa.read() == fb.read(), name


def test_spec_framing():
    """Record bytes follow §4: version line, named fields, CRLF block tail."""
    rec = warc_record_bytes(
        "resource", b"hello", target_uri="http://x/", date_epoch=0.0,
        content_type="text/plain")
    head, _, rest = rec.partition(b"\r\n\r\n")
    lines = head.split(b"\r\n")
    assert lines[0] == b"WARC/1.1"
    keys = {l.split(b":")[0] for l in lines[1:]}
    for k in (b"WARC-Type", b"WARC-Record-ID", b"WARC-Date",
              b"WARC-Target-URI", b"WARC-Payload-Digest", b"Content-Length"):
        assert k in keys, k
    assert rest == b"hello\r\n\r\n"
    # digest is the labelled sha1-base32 of the block (§5.8)
    import base64
    want = "sha1:" + base64.b32encode(hashlib.sha1(b"hello").digest()).decode()
    assert f"WARC-Payload-Digest: {want}".encode() in head


def test_gzip_member_per_record(spark, tmpdir_path):
    """§annex D: every record its own gzip member — member count == records."""
    out = os.path.join(tmpdir_path, "warc")
    m = write_warc(_pages(spark, 40), out, 1)
    path = os.path.join(out, "archive-000000.warc.gz")
    data = open(path, "rb").read()
    members = 0
    while data[:2] == b"\x1f\x8b":
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        do.decompress(data)
        members += 1
        data = do.unused_data
    assert data == b""
    assert members == m["files"][0]["n_records"] + 1  # + warcinfo


def test_torn_tail_tolerated(spark, tmpdir_path):
    out = os.path.join(tmpdir_path, "warc")
    write_warc(_pages(spark, 30), out, 1, gzip_records=False)
    path = os.path.join(out, "archive-000000.warc")
    data = open(path, "rb").read()
    open(path, "wb").write(data[: int(len(data) * 0.6)])
    got = read_warc(spark, out).collect()
    assert 0 < len(got) < 31
    assert all(r.digest_ok for r in got)


def test_corrupt_garbage_yields_nothing():
    assert list(parse_warc_stream(b"not a warc at all")) == []
    assert list(parse_warc_stream(b"\x1f\x8b\x08garbage")) == []


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_uri = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E,
                           exclude_characters="\r\n"),
    min_size=1, max_size=80)


@settings(max_examples=200, deadline=None)
@given(blocks=st.lists(st.binary(max_size=512), min_size=1, max_size=8),
       uris=st.lists(_uri, min_size=8, max_size=8),
       epoch=st.floats(min_value=0, max_value=4102444800))
def test_record_stream_roundtrip_property(blocks, uris, epoch):
    """Any payload bytes (including CRLFs, WARC/ magic, gzip magic) framed by
    the writer parse back exactly — per-record and concatenated."""
    recs = [warc_record_bytes("resource", b, target_uri=u, date_epoch=epoch)
            for b, u in zip(blocks, uris)]
    parsed = list(parse_warc_stream(b"".join(recs)))
    assert [p["block"] for p in parsed] == blocks
    assert [p["warc-target-uri"] for p in parsed] == uris[: len(blocks)]
    assert all(p["warc-type"] == "resource" for p in parsed)


@settings(max_examples=100, deadline=None)
@given(blocks=st.lists(st.binary(max_size=256), min_size=1, max_size=5),
       cut=st.floats(min_value=0.0, max_value=0.999))
def test_truncation_never_raises_property(blocks, cut):
    """Every possible truncation point yields a clean prefix, never a raise,
    and never a corrupted block."""
    data = b"".join(
        warc_record_bytes("resource", b, target_uri=f"u{i}", date_epoch=0.0)
        for i, b in enumerate(blocks))
    parsed = list(parse_warc_stream(data[: int(len(data) * cut)]))
    assert len(parsed) <= len(blocks)
    assert [p["block"] for p in parsed] == blocks[: len(parsed)]


@pytest.mark.parametrize("gz", [False, True])
def test_cdx_random_access(spark, tmpdir_path, gz):
    """The cdx index addresses every record: a single ranged read (+ member
    gunzip) returns the exact payload, for both plain and gzip layouts."""
    from crawler_spark.operators.warc import read_warc_record

    out = os.path.join(tmpdir_path, "warc")
    m = write_warc(_pages(spark, 90), out, 3, gzip_records=gz)
    idx = spark.read.parquet(os.path.join(out, "cdx")).collect()
    assert len(idx) == 90 == m["n_records"]
    want = {r.url: r.payload for r in _pages(spark, 90).collect()}
    for r in idx:
        path = os.path.join(out, f"archive-{r.file:06d}{m['ext']}")
        rec = read_warc_record(path, r.offset, r.length)
        assert rec is not None
        assert rec["warc-target-uri"] == r.url
        assert rec["block"].decode() == want[r.url]
        assert rec["warc-payload-digest"] == r.digest


def test_cdx_globally_range_sorted(spark, tmpdir_path):
    """Index shards are globally range-ordered by (url, date) — the
    binary-searchable cluster.idx layout."""
    out = os.path.join(tmpdir_path, "warc")
    write_warc(_pages(spark, 60), out, 2)
    cdx_dir = os.path.join(out, "cdx")
    parts = sorted(f for f in os.listdir(cdx_dir) if f.endswith(".parquet"))
    import pyarrow.parquet as pq
    ranges = []
    for f in parts:
        t = pq.read_table(os.path.join(cdx_dir, f), columns=["url"])
        urls = t["url"].to_pylist()
        if urls:
            assert urls == sorted(urls), f
            ranges.append((urls[0], urls[-1]))
    flat = [u for lo_hi in ranges for u in lo_hi]
    assert flat == sorted(flat)  # shard ranges do not interleave


def test_engine_export_warc(spark, tmp_path_factory):
    """Crawl → WARC handoff: one resource record per fetched URL carrying the
    page's HTML, deterministic across re-export."""
    from crawler_spark.fixtures import generate
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig, ST_FETCHED

    fix = str(tmp_path_factory.mktemp("warc_fix"))
    generate(fix, n_pages=64, n_hosts=4, seed=11)
    eng = CrawlEngine(spark, fix, str(tmp_path_factory.mktemp("warc_ckpt")),
                      CrawlConfig(max_rounds=6))
    eng.run()
    out = str(tmp_path_factory.mktemp("warc_out"))
    m = eng.export_warc(out, n_files=3)
    fetched = {
        r.url for r in eng.fetch_log()
        .filter(F.col("status") == ST_FETCHED).select("url").distinct().collect()
    }
    # emulator SERPs have no stored page body — the archive covers exactly
    # the page-table captures (docstring contract)
    page_urls = {r.url for r in eng.pages.select("url").collect()}
    recs = read_warc(spark, out).filter("warc_type = 'resource'").collect()
    assert {r.target_uri for r in recs} == fetched & page_urls
    assert fetched & page_urls
    assert m["n_records"] == len(fetched & page_urls)
    html = {r.url: r.content for r in eng.pages.select("url", "content").collect()}
    for r in recs:
        assert bytes(r.payload).decode() == html[r.target_uri]
    m2 = eng.export_warc(str(tmp_path_factory.mktemp("warc_out2")), n_files=3)
    assert m2 == m


def test_null_cells_degrade(spark, tmpdir_path):
    """NULL url rows are dropped (no shard identity); NULL payload/epoch
    degrade to empty block / epoch 0 — never an executor raise."""
    from pyspark.sql import functions as F

    df = _pages(spark, 10).withColumn(
        "url", F.when(F.col("url").endswith("/0"), F.lit(None))
        .otherwise(F.col("url"))
    ).withColumn(
        "payload", F.when(F.col("url").endswith("/1"), F.lit(None))
        .otherwise(F.col("payload"))
    ).withColumn(
        "epoch", F.when(F.col("url").endswith("/2"), F.lit(None))
        .otherwise(F.col("epoch")))
    out = os.path.join(tmpdir_path, "warc")
    m = write_warc(df, out, 2)
    assert m["n_records"] == 9  # null-url row dropped
    recs = {r.target_uri: r for r in
            read_warc(spark, out).filter("warc_type='resource'").collect()}
    assert bytes(recs["http://h1.example/p/1"].payload) == b""
    assert recs["http://h2.example/p/2"].date == "1970-01-01T00:00:00Z"
    assert all(r.digest_ok for r in recs.values())


def test_cdx_diff_statuses_and_latest_capture(spark):
    from crawler_spark.operators.warc import cdx_diff

    cols = "url string, date string, file int, offset long, length long, digest string"
    old = spark.createDataFrame([
        ("http://h/a", "2024-01-01T00:00:00Z", 0, 0, 10, "AAA"),
        ("http://h/a", "2024-01-02T00:00:00Z", 0, 10, 10, "AAB"),  # latest old
        ("http://h/b", "2024-01-01T00:00:00Z", 0, 20, 10, "BBB"),
        ("http://h/gone", "2024-01-01T00:00:00Z", 1, 0, 10, "GGG"),
    ], cols)
    new = spark.createDataFrame([
        ("http://h/a", "2024-02-01T00:00:00Z", 0, 0, 10, "AAC"),   # changed
        ("http://h/b", "2024-02-01T00:00:00Z", 0, 10, 10, "BBB"),  # unchanged
        ("http://h/new", "2024-02-01T00:00:00Z", 1, 0, 10, "NNN"),  # added
    ], cols)
    got = {r.url: r for r in cdx_diff(old, new).collect()}
    assert {u: r.status for u, r in got.items()} == {
        "http://h/a": "changed", "http://h/b": "unchanged",
        "http://h/gone": "gone", "http://h/new": "added"}
    a = got["http://h/a"]
    assert a.old_digest == "AAB" and a.new_digest == "AAC"  # latest capture won
    g = got["http://h/gone"]
    assert g.new_date is None and g.new_digest is None
    n = got["http://h/new"]
    assert n.old_date is None and n.old_digest is None


def test_cdx_diff_end_to_end_refetch_list(spark, tmpdir_path):
    """Two real write_warc runs (second crawl mutates one page, drops one,
    adds one) → diff of their cdx parquets is the refetch plan."""
    from crawler_spark.operators.warc import cdx_diff

    def crawl(rows, out):
        df = spark.createDataFrame(rows, "url string, payload string, epoch double")
        write_warc(df, out, 2, cdx=True)
        return spark.read.parquet(os.path.join(out, "cdx"))

    t0, t1 = 1704067200.0, 1706745600.0
    old = crawl([("http://h/1", "one", t0), ("http://h/2", "two", t0),
                 ("http://h/3", "three", t0)],
                os.path.join(tmpdir_path, "c0"))
    new = crawl([("http://h/1", "one", t1), ("http://h/2", "TWO-CHANGED", t1),
                 ("http://h/4", "four", t1)],
                os.path.join(tmpdir_path, "c1"))
    d = cdx_diff(old, new)
    by = {r.url: r.status for r in d.collect()}
    assert by == {"http://h/1": "unchanged", "http://h/2": "changed",
                  "http://h/3": "gone", "http://h/4": "added"}
    refetch = sorted(r.url for r in d.where(
        F.col("status").isin("added", "changed")).collect())
    assert refetch == ["http://h/2", "http://h/4"]
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_incremental_recrawl_via_cdx_diff(spark, tmp_path_factory):
    """Full incremental loop: crawl → WARC+CDX archive, mutate ONE page in
    the web, crawl again → archive, cdx_diff flags exactly that URL as
    changed, refetch_seeds turns the diff into a seed table, and a third
    engine run seeded by it re-fetches the stale URL."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_spark.fixtures import generate
    from crawler_spark.operators.warc import cdx_diff, refetch_seeds
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig, ST_FETCHED

    fix = str(tmp_path_factory.mktemp("inc_fix"))
    generate(fix, n_pages=64, n_hosts=4, seed=11)

    def crawl(fd, tag, **kw):
        ck = str(tmp_path_factory.mktemp(f"inc_ck_{tag}"))
        eng = CrawlEngine(spark, fd, ck, CrawlConfig(max_rounds=6), **kw)
        eng.run()
        out = str(tmp_path_factory.mktemp(f"inc_warc_{tag}"))
        eng.export_warc(out, n_files=2)
        return eng, ck, spark.read.parquet(os.path.join(out, "cdx"))

    _, _, cdx0 = crawl(fix, "c0")
    target = min(r.url for r in cdx0.select("url").collect())

    fix2 = str(tmp_path_factory.mktemp("inc_fix2"))
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

    eng1, ck1, cdx1 = crawl(fix2, "c1")
    d = cdx_diff(cdx0, cdx1)
    by = {r.url: r.status for r in d.collect()}
    assert by[target] == "changed"
    assert all(s == "unchanged" for u, s in by.items() if u != target)

    seeds = refetch_seeds(d)
    assert [(r.seed_id, r.url) for r in seeds.collect()] == [("0", target)]

    # fresh-state refetch crawl (the Common-Crawl per-snapshot pattern)
    eng2 = CrawlEngine(spark, fix2, str(tmp_path_factory.mktemp("inc_ck_c2")),
                       CrawlConfig(max_rounds=1), seeds_df=seeds)
    eng2.run()
    refetched = {r.url for r in eng2.fetch_log()
                 .filter(F.col("status") == ST_FETCHED).select("url").collect()}
    assert target in refetched

    # RESUMED refetch (the long-running-crawl pattern): same checkpoint,
    # seeds_df injects the stale URL past the already-seen membership at
    # PRIORITY_RECRAWL — TTL-sweep semantics, no filter surgery
    last_round = eng1.fetch_log().agg(F.max("round")).first()[0]
    eng3 = CrawlEngine(spark, fix2, ck1,
                       CrawlConfig(max_rounds=last_round + 2), seeds_df=seeds)
    eng3.run(resume=True)
    late = (eng3.fetch_log()
            .filter((F.col("status") == ST_FETCHED)
                    & (F.col("round") > last_round)
                    & (F.col("url") == target)))
    assert late.count() == 1
