"""WebDataset-style sharded tar export for image+caption training samples.

The training-data handoff the north rule's image+caption table feeds: POSIX
tar shards where each sample is a run of entries sharing a basename key
(``<key>.jpg`` payload bytes, ``<key>.txt`` caption, ``<key>.json``
metadata) — the public WebDataset convention (github.com/webdataset/
webdataset; the LAION releases ship exactly this layout), readable by any
sequential tar streamer with zero index structures.  Nothing beyond stdlib
``tarfile`` is needed to write or read it.

Scale design (100 TB of payload bytes):

* **Payload bytes move at most once — and read amplification is accounted
  for.**  Three paths, cheapest first: ``export_image_captions`` with
  ``layout="source"`` (the default and the 100 TB path) groups by PAYLOAD
  FILE — each file pyarrow-read exactly once, zero byte shuffle, zero JVM
  transit (the ``plans.engine._payload_check`` direct-read pattern), global
  sample mixing deferred to the training loader's shard+buffer shuffle
  exactly as the public WebDataset/LAION releases do.  ``layout="hash"``
  gives layout-independent deterministic global mixing —
  ``md5('wds:' || key) mod n_shards``, engine-portable and seed-free — but
  re-reads each payload file once per touching shard (amplification
  ≈ min(n_shards, rows/file) per file; see BASELINE.md Lesson 6), so it is
  for small or highly SELECTIVE exports, where the pyarrow ``filters``
  row-group pushdown also bites.  ``write_webdataset`` covers bytes already
  in DataFrame columns: exactly one shuffle (the shard exchange), never a
  row-number layout (a range shuffle *plus* a grouping shuffle of heavy
  binary cells).  Hash-shard sizes are binomially balanced — at ≥10⁴
  samples/shard the spread is <2% (documented, not hidden).
* **Streaming writer.**  Tars are written straight to their ``.tmp`` file
  through an md5-folding wrapper (``tarfile`` stream mode ``w|`` — no
  seeks, no in-memory tar image).  The shuffle path holds ONE Arrow batch +
  one in-progress sample; the direct path holds one shard's payload dict
  (shards are sized 0.1-1 GiB by the published WebDataset guidance, so that
  is the task's working set by construction).  At 100 TB that is O(10⁵)
  shards, far above any practical executor count, so every task streams a
  handful of whole shards.
* **Byte-deterministic tars.**  Entry metadata is pinned (mtime=0,
  uid/gid=0, empty uname/gname, USTAR format) and within-shard order is the
  total order (skey, key) — two runs over the same input produce
  byte-identical shard files (pytest pins this with md5 compares).
* **Torn-write safety + manifest-last seal.**  Each tar is written to a
  ``.tmp-<uuid>`` and atomically renamed (same discipline as
  ``exporters.write_export_files``); a ``_manifest.json`` carrying
  per-shard sample counts, byte sizes, and content md5s is written by the
  driver only after every shard task has reported success — a reader that
  finds no manifest treats the export as unsealed, exactly the
  snapshot-manifest convention in ``sources/snapshots.py``.

The reference has no training-export analog (its exporters, K1-K6 in
``operators/exporters.py``, write per-task text files); this sink is part
of the LLM-pipeline tier the build brief adds on top.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "shard_assignments",
    "write_webdataset",
    "export_image_captions",
    "read_webdataset_dir",
]

_MANIFEST = "_manifest.json"


class _Md5File:
    """File wrapper folding an md5 + byte count into sequential writes, so
    the shard digest costs no second pass and no buffering."""

    def __init__(self, f):
        self._f = f
        self.md5 = hashlib.md5()
        self.n = 0

    def write(self, b):
        self._f.write(b)
        self.md5.update(b)
        self.n += len(b)
        return len(b)

    def close(self):
        self._f.close()


class _ShardTarWriter:
    """Streams tar shards to disk one at a time (roll on shard change).

    ``tarfile`` stream mode (``w|``) never seeks, so the tar goes straight
    to the ``.tmp`` file — memory holds only the entry being added.  Each
    finished shard is atomically renamed into place and reported as a
    (shard, n_samples, bytes, md5) stat tuple.
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.name = None
        self._tar = None
        self._fh = None
        self._tmp = None
        self._n = 0
        self._keys = None
        self.stats: list[tuple] = []

    def start(self, name: str) -> None:
        self.finish()
        self.name = str(name)
        final = os.path.join(self.out_dir, self.name)
        self._tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        self._fh = _Md5File(open(self._tmp, "wb"))
        self._tar = tarfile.open(fileobj=self._fh, mode="w|",
                                 format=tarfile.USTAR_FORMAT)
        self._n = 0
        self._keys = set()

    def add_sample(self, key: str, parts: list[tuple[str, bytes]]) -> None:
        if key in self._keys:
            raise ValueError(f"duplicate sample key {key!r} in shard {self.name}")
        self._keys.add(key)
        for ext, payload in parts:
            info = tarfile.TarInfo(name=f"{key}.{ext}")
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            self._tar.addfile(info, io.BytesIO(payload))
        self._n += 1

    def finish(self):
        if self._tar is None:
            return None
        self._tar.close()
        self._fh.close()
        os.replace(self._tmp, os.path.join(self.out_dir, self.name))
        stat = (self.name, self._n, self._fh.n, self._fh.md5.hexdigest())
        self.stats.append(stat)
        self.name = self._tar = self._fh = self._tmp = self._keys = None
        self._n = 0
        return stat


def shard_assignments(
    df: DataFrame, key_col: str, n_shards: int,
    shard_col: str = "shard", skey_col: str = "skey",
) -> DataFrame:
    """Add the deterministic shard id + within-shard sort key.

    ``shard = conv(md5('wds:' || key)[:15], 16, 10) mod n_shards`` — 60 bits
    of the md5 as an exact BIGINT (15 hex digits < 2⁶³, no float rounding),
    so a DuckDB oracle can reproduce the assignment bit-for-bit with
    ``from_hex``/``substr`` arithmetic.  Pure JVM expressions — no UDF, no
    shuffle; the shuffle happens once, in :func:`write_webdataset`.
    """
    for reserved in (shard_col, skey_col):
        if reserved in df.columns:
            raise ValueError(f"input already has a column named {reserved!r}")
    # a NULL key has no identity to shard on — dropped here (documented),
    # so downstream int(shard) can never see a NULL row
    df = df.filter(F.col(key_col).isNotNull())
    skey = F.md5(F.concat(F.lit("wds:"), F.col(key_col).cast("string")))
    return df.withColumn(skey_col, skey).withColumn(
        shard_col,
        (F.conv(F.substring(skey_col, 1, 15), 16, 10).cast("long")
         % F.lit(int(n_shards))).cast("int"),
    )


def _seal_manifest(out_dir: str, prefix: str, n_shards: int,
                   parts: list[str], stats: list[dict]) -> dict:
    manifest = {
        "format": "webdataset",
        "prefix": prefix,
        "n_shards": int(n_shards),
        "parts": parts,
        "n_samples": int(sum(s["n_samples"] for s in stats)),
        "shards": stats,
    }
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


def write_webdataset(
    df: DataFrame, out_dir: str, key_col: str, parts: dict[str, str],
    n_shards: int, prefix: str = "shard",
) -> dict:
    """Write ``df`` as WebDataset tar shards; returns the sealed manifest.

    ``parts`` maps tar-entry extension → source column, e.g.
    ``{"jpg": "bytes", "txt": "caption"}``.  Binary columns are written
    verbatim; everything else is cast to string and utf-8 encoded; NULL
    parts are skipped (a sample may lack an optional part).  Sample keys
    must be unique — duplicate keys inside one tar would shadow each other
    in every WebDataset reader, so the writer raises on collision.

    This is the general path: sample bytes live in ``df`` columns and cross
    the wire exactly once (the shard repartition).  When payloads already
    sit in executor-readable columnar files, prefer
    :func:`export_image_captions`, which shuffles no payload bytes at all.
    """
    from pyspark.sql.types import BinaryType

    sdf = shard_assignments(df, key_col, n_shards)
    is_binary = {
        ext: isinstance(sdf.schema[col].dataType, BinaryType)
        for ext, col in parts.items()
    }
    cols = [F.col("shard"), F.col("skey"), F.col(key_col).cast("string").alias("_key")]
    for ext, col in parts.items():
        c = F.col(col) if is_binary[ext] else F.col(col).cast("string")
        cols.append(c.alias(f"_p_{ext}"))
    rows = (
        sdf.select(*cols)
        .repartition(int(n_shards), "shard")
        .sortWithinPartitions("shard", "skey", "_key")
    )

    exts = list(parts)
    os.makedirs(out_dir, exist_ok=True)

    def _write(it):
        import pandas as pd

        # rows arrive grouped by shard id; writer state persists across the
        # partition's Arrow batches, so memory holds one batch + the sample
        # being added — never a whole shard.
        w = _ShardTarWriter(out_dir)
        cur = None
        for pdf in it:
            shards = pdf["shard"].to_numpy()
            keys = pdf["_key"].to_numpy()
            part_cols = {ext: pdf[f"_p_{ext}"].to_numpy() for ext in exts}
            for i in range(len(pdf)):
                if int(shards[i]) != cur:
                    cur = int(shards[i])
                    w.start(f"{prefix}-{cur:06d}.tar")
                sample = []
                for ext in exts:
                    v = part_cols[ext][i]
                    if v is None:
                        continue
                    payload = (bytes(v) if isinstance(v, (bytes, bytearray))
                               else str(v).encode())
                    sample.append((ext, payload))
                w.add_sample(keys[i], sample)
        w.finish()
        yield pd.DataFrame(
            w.stats, columns=["name", "n_samples", "bytes", "md5"]
        )

    # mapInPandas (not foreachPartition) so each task reports its shard
    # stats back — the tiny stat rows are the only thing collected; the
    # manifest is written LAST, sealing the export (manifest-last, like
    # sources/snapshots.py round commits).
    stats = sorted(
        (r.asDict() for r in rows.mapInPandas(
            _write, schema="name string, n_samples long, bytes long, md5 string"
        ).collect()),
        key=lambda s: s["name"],
    )
    return _seal_manifest(out_dir, prefix, n_shards, exts, stats)


def export_image_captions(
    samples: DataFrame, out_dir: str, n_shards: int = 0,
    prefix: str = "shard", key_col: str = "image_id", path_col: str = "path",
    resize_px: int | None = None, thumb_fmt: str = "png",
    layout: str = "source", samples_per_shard: int = 4096,
) -> dict:
    """Direct-read WebDataset export of the north-rule image+caption shape.

    ``samples`` carries (image_id, path, caption, w, h, fmt, phash) — path
    is the payload parquet file holding the row's ``bytes`` (the engine's
    ``images_index`` join).  Spark shuffles ONLY these narrow strings; the
    writer tasks pyarrow-read the bytes straight from the referenced files
    (``plans.engine._payload_check`` pattern), so payload bytes go
    storage → Python → tar with no JVM hop and no byte shuffle.

    Two layouts, because read amplification is the real cost at scale:

    * ``layout="source"`` (default — the 100 TB path): tasks group by
      PAYLOAD FILE, so every payload file is read EXACTLY ONCE; each task
      chunks its (skey-ordered) samples into tars of ``samples_per_shard``
      named ``<prefix>-<md5(path)[:12]>-<k>.tar``.  Total IO is one linear
      pass — the same layout img2dataset/LAION actually publish, where
      global sample mixing is the training loader's job (WebDataset's
      shard-shuffle + buffer-shuffle).  Deterministic given the payload
      file layout.
    * ``layout="hash"`` (global deterministic mixing): tasks group by the
      md5 shard of :func:`shard_assignments` (``n_shards`` required), so
      shard contents are layout-independent and byte-identical on any
      engine — but every payload file is re-read by every shard that
      touches it: read amplification ≈ min(n_shards, rows-per-file) per
      file, which at 10⁵ shards × 10⁴-row files is a 100× IO regression
      versus one shuffle.  Use it for small or highly selective exports
      (the pyarrow ``filters`` pushdown prunes row groups when the wanted
      ids are sparse), never for a full-corpus export.

    Each sample becomes ``<key>.<fmt>`` (raw stored bytes — the training
    consumer gets the original codec stream), ``<key>.txt`` (caption,
    utf-8; omitted when NULL) and ``<key>.json`` (sorted-key metadata:
    fmt/h/phash/w).  ``resize_px`` switches to TRAINING-PREP mode: each
    payload is decoded (the repo's own from-spec codecs),
    area-average-resampled to ``resize_px × resize_px``
    (``functions.imaging.resize_area`` — exact INTER_AREA semantics) and
    re-encoded as ``thumb_fmt`` inside the writer task — decode/resize/
    encode ride the same zero-JVM-transit path; metadata then also carries
    the source dims/codec (src_fmt/src_h/src_w).  The task working set is
    one shard's payload dict (shards are 0.1-1 GiB by WebDataset sizing
    guidance).
    """
    if layout not in ("source", "hash"):
        raise ValueError(f"layout must be 'source' or 'hash', got {layout!r}")
    if layout == "hash" and n_shards <= 0:
        raise ValueError("layout='hash' requires n_shards > 0")
    meta_cols = ["caption", "w", "h", "fmt", "phash"]
    # groupBy().applyInPandas below is the ONE shuffle of these narrow
    # strings (it hash-partitions on the group key itself — an explicit
    # repartition here would be a redundant second exchange, verified by
    # plan inspection in tests)
    # _key (string) names tar entries; _kraw keeps the key column's NATIVE
    # type — the pyarrow `in` filter below must compare against the payload
    # file's column in its own type (string values vs an int64 key column
    # would error or match nothing)
    if layout == "hash":
        sdf = shard_assignments(samples, key_col, n_shards)
        rows = sdf.select(
            "shard", "skey", F.col(key_col).cast("string").alias("_key"),
            F.col(key_col).alias("_kraw"),
            F.col(path_col).alias("_path"), *meta_cols,
        )
        group_col = "shard"
    else:
        rows = samples.filter(F.col(key_col).isNotNull()).select(
            F.md5(F.concat(F.lit("wds:"), F.col(key_col).cast("string"))
                  ).alias("skey"),
            F.col(key_col).cast("string").alias("_key"),
            F.col(key_col).alias("_kraw"),
            F.col(path_col).alias("_path"), *meta_cols,
        )
        group_col = "_path"

    os.makedirs(out_dir, exist_ok=True)

    def _write_group(pdf):
        import hashlib as _hashlib
        import re

        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        pdf = pdf.sort_values(["skey", "_key"], kind="mergesort")
        # gather payload bytes: ONE pyarrow read per distinct file in the
        # group (source layout: exactly this task's one file); the `in`
        # filter prunes row groups when the wanted ids are sparse
        blob: dict = {}
        for path, grp in pdf.groupby("_path", sort=False):
            local = re.sub("^file:/*", "/", str(path))
            want = sorted(grp["_kraw"].unique().tolist())
            tbl = pq.read_table(local, columns=[key_col, "bytes"],
                                use_threads=False,
                                filters=[(key_col, "in", want)])
            w_arr = pa.array(want)
            tbl = tbl.filter(pc.is_in(tbl[key_col], value_set=w_arr))
            blob.update(zip(tbl[key_col].to_pylist(), tbl["bytes"].to_pylist()))
        missing = set(pdf["_kraw"].tolist()) - set(blob)
        if missing:
            raise ValueError(f"payload rows missing for ids {sorted(missing)[:3]}")

        w = _ShardTarWriter(out_dir)
        if layout == "hash":
            w.start(f"{prefix}-{int(pdf['shard'].iloc[0]):06d}.tar")
        else:
            stem = _hashlib.md5(str(pdf["_path"].iloc[0]).encode()).hexdigest()[:12]

        def _i(v):
            # NULL metadata cells degrade to JSON null, never an executor
            # raise (the package-wide executor-safety contract)
            return None if v is None or v != v else int(v)

        cols = [pdf[c].to_numpy()
                for c in ("_key", "_kraw", "caption", "w", "h", "fmt", "phash")]
        for j, (key, kraw, caption, iw, ih, fmt, phash) in enumerate(zip(*cols)):
            if layout == "source" and j % samples_per_shard == 0:
                w.start(f"{prefix}-{stem}-{j // samples_per_shard:04d}.tar")
            if resize_px is None:
                meta = {"fmt": str(fmt), "h": _i(ih), "phash": _i(phash),
                        "w": _i(iw)}
                payload = (str(fmt), bytes(blob[kraw]))
            else:
                from crawler_spark.functions.imaging import (
                    decode_image, encode_image, resize_area)

                arr = resize_area(decode_image(bytes(blob[kraw]), str(fmt)),
                                  int(resize_px), int(resize_px))
                payload = (thumb_fmt, encode_image(arr, thumb_fmt))
                meta = {"fmt": thumb_fmt, "h": int(resize_px),
                        "phash": _i(phash), "src_fmt": str(fmt),
                        "src_h": _i(ih), "src_w": _i(iw),
                        "w": int(resize_px)}
            parts = [payload]
            if caption is not None:  # NULL caption → sample has no .txt part
                parts.append(("txt", str(caption).encode()))
            parts.append(("json", json.dumps(meta, sort_keys=True,
                                             separators=(",", ":")).encode()))
            w.add_sample(key, parts)
        w.finish()
        return pd.DataFrame(w.stats,
                            columns=["name", "n_samples", "bytes", "md5"])

    stats = sorted(
        (r.asDict() for r in rows.groupBy(group_col).applyInPandas(
            _write_group, schema="name string, n_samples long, bytes long, md5 string"
        ).collect()),
        key=lambda s: s["name"],
    )
    if resize_px is None:
        # str() keys the sort even when fmt is NULL (the writer labelled
        # that entry '<key>.None'); without it the manifest seal would
        # TypeError AFTER every shard was already written
        parts = sorted({str(r["fmt"]) for r in
                        samples.select("fmt").distinct().collect()})
    else:
        parts = [thumb_fmt]
    return _seal_manifest(out_dir, prefix, len(stats), parts + ["txt", "json"],
                          stats)


def read_webdataset_dir(out_dir: str) -> list[dict]:
    """Stdlib reader twin for tests: sealed samples as [{key, <ext>: bytes}].

    Refuses an unsealed export (no manifest) — the consumer-side half of the
    manifest-last contract.
    """
    mpath = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"unsealed webdataset export (no {_MANIFEST})")
    with open(mpath, encoding="utf-8") as f:
        manifest = json.load(f)
    samples: dict[str, dict] = {}
    for s in manifest["shards"]:
        path = os.path.join(out_dir, s["name"])
        with tarfile.open(path, mode="r") as tar:
            for m in tar.getmembers():
                key, ext = m.name.rsplit(".", 1)
                rec = samples.setdefault(key, {"key": key, "_shard": s["name"]})
                rec[ext] = tar.extractfile(m).read()
    return sorted(samples.values(), key=lambda r: r["key"])
