"""WARC archival source + sink (WARC/1.1, ISO 28500).

The crawl world's interchange format — what Common Crawl publishes and what
every archival toolchain (wget, Heritrix, warcio, the IIPC tooling) reads.
Format per the public spec (iipc/warc-specifications, "WARC/1.1 annotated"):
a WARC file is a sequence of records; each record is

    WARC/1.1<CRLF>
    <named-field>: <value><CRLF> ...          (WARC-Type, WARC-Record-ID,
    Content-Length: <n><CRLF>                  WARC-Date, WARC-Target-URI,
    <CRLF>                                     Content-Type, digests...)
    <n block bytes><CRLF><CRLF>

and a ``.warc.gz`` stores each record as its OWN gzip member so readers can
split/seek at member boundaries (the spec's annex D convention; multi-member
decoding is what ``zlib`` exposes directly).  Everything here is stdlib —
no warc library exists in this sandbox, and none is needed.

Determinism (repo convention — re-runs byte-identical, golden-testable):

* ``WARC-Record-ID`` is ``<urn:uuid:...>`` whose 128 bits are the md5 of
  (type, target-uri, date) — syntactically a valid urn:uuid, semantically a
  content address, so the same crawl always archives to the same bytes
  (a random uuid4, as most writers use, would defeat the repo's
  byte-determinism discipline).
* gzip members are written with ``mtime=0`` and fixed compression level.
* File assignment is the md5 shard hash (``webdataset.shard_assignments``)
  and within-file order is (skey, url) — layout-independent.

Scale design: the sink is the webdataset sink's shape — ONE shuffle of the
archive rows grouped per output file, streaming writer (one record in memory
at a time), write-then-rename, driver seals a ``_manifest.json`` last (the
manifest is this repo's sealing convention; WARC tools ignore the extra
file).  The source parallelizes per WARC file — Spark distributes only path
strings and each task streams records straight from storage (the engine's
direct-read discipline); WARC files are written 0.1-1 GiB in practice, so
file count ≫ executor count at 100 TB.

Reference: the crawler has no archival sink (its exporters write per-task
text files); WARC is part of the crawl-tier surface this repo adds.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.operators.webdataset import shard_assignments

__all__ = ["write_warc", "write_wet", "write_wat", "read_warc",
           "read_warc_record", "warc_record_bytes", "html_title_links"]

_MANIFEST = "_manifest.json"
_CRLF = b"\r\n"


def _warc_date(epoch: float) -> str:
    """UTC ISO-8601 with second precision (spec §5.4), timezone-free math."""
    import datetime as dt

    return dt.datetime.fromtimestamp(
        float(epoch), tz=dt.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_id(warc_type: str, target_uri: str, date: str) -> str:
    h = hashlib.md5(f"warc:{warc_type}:{target_uri}:{date}".encode()).digest()
    return f"<urn:uuid:{uuid.UUID(bytes=h)}>"


def _payload_digest(block: bytes) -> str:
    """``sha1:<base32>`` labelled digest (spec §5.8 / §5.9)."""
    return "sha1:" + base64.b32encode(hashlib.sha1(block).digest()).decode()


def warc_record_bytes(warc_type: str, block: bytes, *, target_uri: str = None,
                      date_epoch: float = 0.0, content_type: str = None,
                      extra: dict = None, id_seed: str = "") -> bytes:
    """Serialize one WARC/1.1 record (CRLF framing per spec §4).

    ``id_seed`` disambiguates the content-addressed record id for records
    without a target URI (warcinfo) — deterministic across re-runs, unique
    across files.
    """
    date = _warc_date(date_epoch)
    fields = [("WARC-Type", warc_type),
              ("WARC-Record-ID", _record_id(warc_type, target_uri or id_seed, date)),
              ("WARC-Date", date)]
    if target_uri is not None:
        fields.append(("WARC-Target-URI", target_uri))
    fields.append(("WARC-Payload-Digest", _payload_digest(block)))
    if content_type is not None:
        fields.append(("Content-Type", content_type))
    for k, v in (extra or {}).items():
        fields.append((k, str(v)))
    fields.append(("Content-Length", str(len(block))))
    lines = [b"WARC/1.1"] + [f"{k}: {v}".encode() for k, v in fields]
    return _CRLF.join(lines) + _CRLF + _CRLF + block + _CRLF + _CRLF


def _gzip_member(data: bytes, level: int = 6) -> bytes:
    """One deterministic gzip member (mtime=0, no OS byte variance)."""
    co = zlib.compressobj(level, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


def write_warc(
    df: DataFrame, out_dir: str, n_files: int, *,
    url_col: str = "url", payload_col: str = "payload",
    epoch_col: str = "epoch", warc_type: str = "resource",
    content_type: str = "text/html", gzip_records: bool = True,
    prefix: str = "archive", software: str = "crawler_spark",
    cdx: bool = True, refers_to_type: str = None, flavor: str = "",
) -> dict:
    """Archive ``df`` rows as WARC files; returns the sealed manifest.

    Each output file opens with a ``warcinfo`` record (spec §6.2: software +
    format fields, ``WARC-Filename``) followed by one ``warc_type`` record
    per row, string payloads utf-8 encoded.  One shuffle total (file-hash
    repartition); the writer streams record-at-a-time.

    ``cdx=True`` additionally writes ``<out_dir>/cdx/`` — a record-level
    index parquet ``(url, date, file, offset, length, digest)`` in GLOBAL
    url range order (repartitionByRange → binary-searchable shards, the
    Common Crawl ``cluster.idx``/CDXJ pattern expressed as a columnar
    table).  ``offset/length`` address the record's own gzip member (annex
    D framing is what makes member-level seeks possible), so
    :func:`read_warc_record` serves ONE record with a single ranged read —
    the random-access path a 100 TB archive actually needs.  The index rows
    are written distributedly by Spark (never collected); only the tiny
    per-file stats reach the driver.  The writer's record rows flow through
    one eager localCheckpoint so the tar-writing job runs exactly once for
    both consumers (stats + index), then the blocks are released.

    ``refers_to_type`` stamps each record with a ``WARC-Refers-To`` header
    naming the ``refers_to_type`` record of the same (url, date) — the
    spec's link from a derived record (WET ``conversion`` / WAT
    ``metadata``) back to its original; record ids are content addresses
    here (module docstring), so the reference is computable without reading
    the original archive.  ``flavor`` infixes the file extension
    (``.warc.<flavor>[.gz]``, the Common Crawl ``.warc.wet.gz`` /
    ``.warc.wat.gz`` naming convention).
    """
    from pyspark.sql.types import BinaryType

    is_bin = isinstance(df.schema[payload_col].dataType, BinaryType)
    payload = (F.col(payload_col) if is_bin
               else F.encode(F.col(payload_col).cast("string"), "utf-8"))
    rows = (
        shard_assignments(df, url_col, n_files, shard_col="_file")
        .select(F.col("_file"), F.col("skey"),
                F.col(url_col).cast("string").alias("_url"),
                payload.alias("_payload"),
                F.col(epoch_col).cast("double").alias("_epoch"))
        .repartition(int(n_files), "_file")
        .sortWithinPartitions("_file", "skey", "_url")
    )
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc" + (f".{flavor}" if flavor else "") + (".gz" if gzip_records else "")

    def _write(it):
        import pandas as pd

        state = {"file": None, "fh": None, "tmp": None, "n": 0,
                 "md5": None, "bytes": 0}
        out_rows: list[tuple] = []

        def emit(data: bytes) -> int:
            out = _gzip_member(data) if gzip_records else data
            state["fh"].write(out)
            state["md5"].update(out)
            state["bytes"] += len(out)
            return len(out)

        def close_current():
            if state["fh"] is None:
                return
            state["fh"].close()
            final = os.path.join(out_dir, f"{prefix}-{state['file']:06d}{ext}")
            os.replace(state["tmp"], final)
            out_rows.append(("file", None, None, state["file"], None,
                             state["bytes"], state["md5"].hexdigest(),
                             state["n"]))
            state.update(file=None, fh=None, tmp=None, n=0, md5=None, bytes=0)

        def open_file(fid: int):
            close_current()
            name = f"{prefix}-{fid:06d}{ext}"
            # per-attempt tmp suffix (webdataset's discipline): speculative /
            # zombie task attempts must never interleave into one tmp file
            state.update(file=fid,
                         tmp=os.path.join(
                             out_dir, f"{name}.tmp-{uuid.uuid4().hex[:8]}"),
                         md5=hashlib.md5(), n=0, bytes=0)
            state["fh"] = open(state["tmp"], "wb")
            info = (f"software: {software}\r\n"
                    f"format: WARC File Format 1.1\r\n").encode()
            # id_seed=name: warcinfo has no target URI, and spec §5.2 wants
            # globally unique ids — without the filename in the address every
            # file's lead record would share one id
            emit(warc_record_bytes(
                "warcinfo", info, date_epoch=0.0,
                content_type="application/warc-fields",
                extra={"WARC-Filename": name}, id_seed=name))

        cols = ["kind", "url", "date", "file", "offset", "length", "digest", "n"]
        for pdf in it:
            files = pdf["_file"].to_numpy()
            urls = pdf["_url"].to_numpy()
            payloads = pdf["_payload"].to_numpy()
            epochs = pdf["_epoch"].to_numpy()
            for i in range(len(pdf)):
                if int(files[i]) != state["file"]:
                    open_file(int(files[i]))
                # NULL payload/epoch degrade (empty block / epoch 0), never
                # an executor raise
                block = b"" if payloads[i] is None else bytes(payloads[i])
                ep = epochs[i]
                ep = 0.0 if ep is None or ep != ep else float(ep)
                off = state["bytes"]
                extra = None
                if refers_to_type is not None:
                    extra = {"WARC-Refers-To": _record_id(
                        refers_to_type, str(urls[i]), _warc_date(ep))}
                ln = emit(warc_record_bytes(
                    warc_type, block, target_uri=str(urls[i]),
                    date_epoch=ep, content_type=content_type, extra=extra))
                out_rows.append(("rec", str(urls[i]),
                                 _warc_date(ep), state["file"],
                                 off, ln, _payload_digest(block), None))
                state["n"] += 1
            # flush index rows per input batch — memory stays O(batch)
            yield pd.DataFrame(out_rows, columns=cols)
            out_rows = []
        close_current()
        yield pd.DataFrame(out_rows, columns=cols)

    recs = rows.mapInPandas(_write, schema=(
        "kind string, url string, date string, file int, offset long, "
        "length long, digest string, n long")).localCheckpoint()
    try:
        stats = sorted(
            ({"file": r.file, "n_records": r.n, "bytes": r.length,
              "md5": r.digest}
             for r in recs.filter(F.col("kind") == "file").collect()),
            key=lambda s: s["file"],
        )
        if cdx:
            (recs.filter(F.col("kind") == "rec")
             .select("url", "date", "file", "offset", "length", "digest")
             .repartitionByRange(max(1, int(n_files)), "url", "date")
             .sortWithinPartitions("url", "date")
             .write.mode("overwrite").parquet(os.path.join(out_dir, "cdx")))
    finally:
        recs.unpersist()
    manifest = {"format": "warc/1.1", "prefix": prefix, "ext": ext,
                "n_files": int(n_files), "warc_type": warc_type, "cdx": cdx,
                "n_records": int(sum(s["n_records"] for s in stats)),
                "files": stats}
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


def read_warc_record(warc_path: str, offset: int, length: int):
    """Random-access one record via its cdx (offset, length) — a single
    ranged read (+ one member gunzip for ``.warc.gz``); returns the parsed
    header dict with ``block``, or None if the slice is not a record."""
    with open(warc_path, "rb") as f:
        f.seek(int(offset))
        raw = f.read(int(length))
    return next(iter(parse_warc_stream(raw)), None)


def _parse_records(data: bytes):
    """Yield complete records from one plain-WARC buffer; RETURN the byte
    offset consumed, so a caller feeding member-at-a-time can carry an
    incomplete tail record into the next member's buffer."""
    pos = 0
    while True:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            return pos
        try:
            lines = data[pos:head_end].decode("utf-8", "strict").split("\r\n")
        except UnicodeDecodeError:
            return pos
        hdr = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            if not _:
                return pos
            hdr[k.strip().lower()] = v.strip()
        try:
            n = int(hdr["content-length"])
        except (KeyError, ValueError):
            return pos
        block = data[head_end + 4:head_end + 4 + n]
        if len(block) != n or data[head_end + 4 + n:head_end + 4 + n + 4] != _CRLF * 2:
            return pos
        hdr["block"] = block
        yield hdr
        pos = head_end + 4 + n + 4


_GZ_CHUNK = 1 << 20


def parse_warc_stream(data: bytes):
    """Yield records from raw WARC bytes (gzip multi-member or plain).

    Tolerant per the repo's executor discipline: a torn/corrupted tail ends
    the stream (records before it are yielded) — malformed input must never
    raise inside a task.  Yields dicts with lower-cased header keys plus
    ``block``.

    Memory stays O(one member + carry): gzip members are inflated and
    parsed ONE AT A TIME from a memoryview walked by offset (never
    ``unused_data``-slicing the remaining compressed buffer per member,
    which would be O(members × file) copies), and a record that spans
    members (legal, if against annex D's one-per-member recommendation) is
    carried as the unconsumed tail into the next member's parse.
    """
    if data[:2] != b"\x1f\x8b":
        yield from _parse_records(data)
        return
    mv = memoryview(data)
    pos, carry = 0, b""
    while pos + 2 <= len(mv) and mv[pos:pos + 2] == b"\x1f\x8b":
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = []
        try:
            while not do.eof and pos < len(mv):
                chunk = mv[pos:pos + _GZ_CHUNK]
                out.append(do.decompress(chunk))
                pos += len(chunk)
        except zlib.error:
            return  # torn/corrupt member: stream ends, prior records stand
        if not do.eof:
            return  # truncated final member
        pos -= len(do.unused_data)  # hand back over-read bytes (≤ one chunk)
        buf = carry + b"".join(out) if carry else b"".join(out)
        consumed = yield from _parse_records(buf)
        carry = buf[consumed:]


def read_warc(spark: SparkSession, in_dir: str) -> DataFrame:
    """WARC directory → DataFrame, one row per record.

    Columns: ``file, warc_type, record_id, date, target_uri, content_type,
    payload (binary), digest_ok (payload sha1 matches the record's labelled
    digest — the archive-integrity check)``.  Spark distributes only the
    path strings (one task per WARC file — the parallelism unit at scale,
    like the engine's payload reads); each task reads its whole file and
    parses with the stdlib-only record walker above — WARC files are written
    0.1-1 GiB (``n_files`` sizing), so one file is a task-sized unit, and a
    single record is served without any full-file read via the cdx index +
    :func:`read_warc_record`.
    """
    paths = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if ".warc" in f and f.endswith((".warc", ".gz"))
    )
    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    pdf = pdf.repartition(max(1, len(paths)), "path")

    def _read(it):
        import pandas as pd

        for batch in it:
            for path in batch["path"]:
                rows = []
                with open(path, "rb") as f:
                    data = f.read()
                for rec in parse_warc_stream(data):
                    want = rec.get("warc-payload-digest")
                    rows.append((
                        os.path.basename(path),
                        rec.get("warc-type"),
                        rec.get("warc-record-id"),
                        rec.get("warc-date"),
                        rec.get("warc-target-uri"),
                        rec.get("content-type"),
                        rec["block"],
                        want is None or _payload_digest(rec["block"]) == want,
                    ))
                yield pd.DataFrame(rows, columns=[
                    "file", "warc_type", "record_id", "date", "target_uri",
                    "content_type", "payload", "digest_ok"])

    return pdf.mapInPandas(_read, schema=(
        "file string, warc_type string, record_id string, date string, "
        "target_uri string, content_type string, payload binary, "
        "digest_ok boolean"))


def html_title_links(html: str) -> tuple:
    """(title, ordered-unique anchor hrefs) of one HTML document.

    The WAT metadata projection: first ``<title>`` text plus every
    ``<a href>`` in document order, de-duplicated preserving first
    occurrence (a determinism + payload-size choice over Common Crawl's
    keep-all-occurrences, stated in the WAT envelope's ``Links-Distinct``
    flag).  Reuses the crawl extractor's forgiving DOM builder — malformed
    HTML yields a partial tree, never a raise.
    """
    from crawler_spark.functions.extract import (
        _descendants, node_text, parse_html,
    )

    root = parse_html(html if isinstance(html, str) else "")
    title, links, seen = "", [], set()
    for n in _descendants(root):
        if n.tag == "title" and not title:
            title = node_text(n).strip()
        elif n.tag == "a":
            href = n.attrs.get("href")
            if href and href not in seen:
                seen.add(href)
                links.append(href)
    return title, links


def _as_html_string(df: DataFrame, payload_col: str):
    """payload column as an HTML string (binary payloads utf-8 decoded)."""
    from pyspark.sql.types import BinaryType

    c = F.col(payload_col)
    if isinstance(df.schema[payload_col].dataType, BinaryType):
        c = F.decode(c, "utf-8")
    return c.cast("string")


def write_wet(
    df: DataFrame, out_dir: str, n_files: int, *,
    url_col: str = "url", payload_col: str = "payload",
    epoch_col: str = "epoch", gzip_records: bool = True,
    prefix: str = "wet", cdx: bool = False,
) -> dict:
    """WET extracted-text archive (Common Crawl's ``*.warc.wet.gz`` shape).

    One ``conversion`` record per row (spec §6.8: content converted from
    another record's format), payload = the page's pure text via the K2
    sink's canonical tag-stripper, ``WARC-Refers-To`` the original
    ``resource`` record.  Text derivation is one Arrow-batched column pass
    fused into the same single-shuffle write as :func:`write_warc` — no
    extra job, no extra shuffle.
    """
    from crawler_spark.functions.textops import html_to_text_udf

    wet = df.withColumn("_wet_text",
                        html_to_text_udf()(_as_html_string(df, payload_col)))
    return write_warc(
        wet, out_dir, n_files, url_col=url_col, payload_col="_wet_text",
        epoch_col=epoch_col, warc_type="conversion",
        content_type="text/plain", gzip_records=gzip_records,
        prefix=prefix, cdx=cdx, refers_to_type="resource", flavor="wet",
    )


def write_wat(
    df: DataFrame, out_dir: str, n_files: int, *,
    url_col: str = "url", payload_col: str = "payload",
    epoch_col: str = "epoch", gzip_records: bool = True,
    prefix: str = "wat", cdx: bool = False,
) -> dict:
    """WAT metadata archive (Common Crawl's ``*.warc.wat.gz`` shape).

    One ``metadata`` record per row whose payload is the JSON envelope the
    WAT format defines — WARC header echo plus an ``HTML-Metadata`` section
    (head title, extracted links) — ``WARC-Refers-To`` the original
    ``resource`` record.  JSON is canonicalized (sorted keys, compact
    separators) so re-runs stay byte-identical like every sink here.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _envelope(urls, epochs, htmls):
        out = []
        for url, ep, html in zip(urls, epochs, htmls):
            ep = 0.0 if ep is None or ep != ep else float(ep)
            title, links = html_title_links(html)
            env = {"Envelope": {
                "Format": "WARC",
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": "" if url is None else str(url),
                    "WARC-Date": _warc_date(ep),
                    "WARC-Type": "resource",
                },
                "Payload-Metadata": {
                    "Actual-Content-Type": "text/html",
                    "HTML-Metadata": {
                        "Head": {"Title": title},
                        "Links": [{"path": "A@/href", "url": u}
                                  for u in links],
                        "Links-Distinct": True,
                    },
                },
            }}
            out.append(json.dumps(env, sort_keys=True,
                                  separators=(",", ":")))
        return pd.Series(out, dtype="object")

    wat_udf = pandas_udf(_envelope, "string")
    wat = df.withColumn(
        "_wat_json",
        wat_udf(F.col(url_col).cast("string"),
                F.col(epoch_col).cast("double"),
                _as_html_string(df, payload_col)),
    )
    return write_warc(
        wat, out_dir, n_files, url_col=url_col, payload_col="_wat_json",
        epoch_col=epoch_col, warc_type="metadata",
        content_type="application/json", gzip_records=gzip_records,
        prefix=prefix, cdx=cdx, refers_to_type="resource", flavor="wat",
    )


def cdx_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """URL-level change classification between two crawls' CDX indexes —
    the incremental-recrawl planning query (which URLs to fetch again).

    Inputs are two ``cdx`` parquet DataFrames from :func:`write_warc`
    (``url, date, file, offset, length, digest``); a URL may carry several
    captures, the LATEST (WARC dates are ISO-8601 UTC, so lexicographic =
    chronological; ties broken by digest/file/offset for determinism) wins
    per side.  Output: one row per URL seen in either crawl —
    ``url, status ∈ {added, gone, changed, unchanged}, old_date,
    old_digest, new_date, new_digest``.  ``status IN ('added','changed')``
    is the refetch list; ``gone`` feeds deletion/tombstone handling.

    Plan shape: per-side latest = ONE window over a url-keyed shuffle, then
    a url-keyed full-outer sort-merge join — both sides arrive already
    hash-partitioned by url, so the join reuses the window exchanges; total
    cost is one shuffle of each index, never a pair blow-up.
    """
    def latest(df: DataFrame, side: str) -> DataFrame:
        w = Window.partitionBy("url").orderBy(
            F.col("date").desc(), F.col("digest"), F.col("file"),
            F.col("offset"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                "url",
                F.col("date").alias(f"{side}_date"),
                F.col("digest").alias(f"{side}_digest"),
            )
        )

    j = latest(old, "old").join(latest(new, "new"), "url", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", status.alias("status"), "old_date", "old_digest",
                    "new_date", "new_digest")


def refetch_seeds(diff: DataFrame) -> DataFrame:
    """:func:`cdx_diff` output → seed table for the next incremental crawl
    (the content-change-driven complement of the engine's TTL recrawl).

    Keeps ``status IN ('changed','added')`` — changed URLs first (their
    stored copy is known stale), then added, each block in url order; the
    output matches the fixture ``seeds.parquet`` contract (``seed_id`` =
    string rank the engine reads back as the priority key, ``story_seq`` 0,
    no cookies), so ``CrawlEngine(seeds_df=refetch_seeds(d))`` runs the
    incremental crawl directly.  Scale: one range shuffle over only the
    refetch subset (scale-safe ``global_row_number``, never a
    single-partition window).
    """
    from crawler_spark.operators.ordering import seed_contract_table

    picks = diff.filter(F.col("status").isin("changed", "added")).select(
        "url",
        F.when(F.col("status") == "changed", F.lit(0)).otherwise(F.lit(1)).alias("_blk"),
    )
    return seed_contract_table(picks, ["_blk", "url"])
