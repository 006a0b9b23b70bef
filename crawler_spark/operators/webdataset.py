"""WebDataset-style sharded tar export for image+caption training samples.

The training-data handoff the north rule's image+caption table feeds: POSIX
tar shards where each sample is a run of entries sharing a basename key
(``<key>.jpg`` payload bytes, ``<key>.txt`` caption, ``<key>.json``
metadata) — the public WebDataset convention (github.com/webdataset/
webdataset; the LAION releases ship exactly this layout), readable by any
sequential tar streamer with zero index structures.  Nothing beyond stdlib
``tarfile`` is needed to write or read it.

Scale design (100 TB of payload bytes):

* **One payload shuffle, total.**  Shard assignment is a deterministic hash
  of the sample key — ``md5('wds:' || key) mod n_shards`` (md5-derived
  randomness per the repo convention: engine-portable, seed-free, so shard
  contents are identical on any cluster size / engine / rerun) — NOT a
  global row-number.  A row-number layout (q65's exactly-balanced variant)
  needs a range shuffle *and* a grouping shuffle of the heavy binary cells;
  hash sharding moves each payload byte across the wire exactly once.
  Shard sizes are binomially balanced — at ≥10⁴ samples/shard the spread is
  <2% (documented, not hidden).
* **Streaming writer, no per-shard buffering.**  Rows arrive sorted by
  (shard, skey); the writer rolls to a new tar when the shard id changes,
  so executor memory holds ONE sample at a time — shard size (samples) and
  sample size (bytes) never bound the heap.  ``n_shards`` should be chosen
  so a shard ≈ 0.1-1 GiB (the published WebDataset guidance) — at 100 TB
  that is O(10⁵) shards, far above any practical executor count, so every
  task streams a handful of whole shards.
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

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["shard_assignments", "write_webdataset", "read_webdataset_dir"]

_MANIFEST = "_manifest.json"


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
    skey = F.md5(F.concat(F.lit("wds:"), F.col(key_col).cast("string")))
    return df.withColumn(skey_col, skey).withColumn(
        shard_col,
        (F.conv(F.substring(skey_col, 1, 15), 16, 10).cast("long")
         % F.lit(int(n_shards))).cast("int"),
    )


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
        import hashlib
        import io
        import tarfile
        import uuid

        import pandas as pd

        # one open tar at a time: rows arrive grouped by shard id
        state = {"shard": None, "tar": None, "buf": None, "n": 0, "keys": None}
        stats: list[tuple] = []

        def close_current():
            if state["tar"] is None:
                return None
            state["tar"].close()
            data = state["buf"].getvalue()
            final = os.path.join(out_dir, f"{prefix}-{state['shard']:06d}.tar")
            tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, final)
            stat = (state["shard"], state["n"], len(data),
                    hashlib.md5(data).hexdigest())
            state.update(shard=None, tar=None, buf=None, n=0, keys=None)
            return stat

        def add(tar, name, payload: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(payload))

        # Arrow-batched pass (mapInPandas, never rows.rdd row pickling);
        # writer state persists across the partition's batches, so memory
        # holds one Arrow batch + one in-progress sample, not a shard.
        for pdf in it:
            shards = pdf["shard"].to_numpy()
            keys = pdf["_key"].to_numpy()
            part_cols = {ext: pdf[f"_p_{ext}"].to_numpy() for ext in exts}
            for i in range(len(pdf)):
                if int(shards[i]) != state["shard"]:
                    stat = close_current()
                    if stat is not None:
                        stats.append(stat)
                    state["shard"] = int(shards[i])
                    state["buf"] = io.BytesIO()
                    state["tar"] = tarfile.open(
                        fileobj=state["buf"], mode="w",
                        format=tarfile.USTAR_FORMAT,
                    )
                    state["keys"] = set()
                key = keys[i]
                if key in state["keys"]:
                    raise ValueError(
                        f"duplicate sample key {key!r} in shard {state['shard']}"
                    )
                state["keys"].add(key)
                for ext in exts:
                    v = part_cols[ext][i]
                    if v is None:
                        continue
                    payload = (bytes(v) if isinstance(v, (bytes, bytearray))
                               else str(v).encode())
                    add(state["tar"], f"{key}.{ext}", payload)
                state["n"] += 1
        stat = close_current()
        if stat is not None:
            stats.append(stat)
        yield pd.DataFrame(
            stats, columns=["shard", "n_samples", "bytes", "md5"]
        )

    # mapInPandas (not foreachPartition) so each task reports its shard
    # stats back — the tiny stat rows are the only thing collected; the
    # manifest is written LAST, sealing the export (manifest-last, like
    # sources/snapshots.py round commits).
    stats = sorted(
        (r.asDict() for r in rows.mapInPandas(
            _write, schema="shard int, n_samples long, bytes long, md5 string"
        ).collect()),
        key=lambda s: s["shard"],
    )
    manifest = {
        "format": "webdataset",
        "prefix": prefix,
        "n_shards": int(n_shards),
        "parts": exts,
        "n_samples": int(sum(s["n_samples"] for s in stats)),
        "shards": stats,
    }
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


def read_webdataset_dir(out_dir: str) -> list[dict]:
    """Stdlib reader twin for tests: sealed samples as [{key, <ext>: bytes}].

    Refuses an unsealed export (no manifest) — the consumer-side half of the
    manifest-last contract.
    """
    import tarfile

    mpath = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"unsealed webdataset export (no {_MANIFEST})")
    with open(mpath, encoding="utf-8") as f:
        manifest = json.load(f)
    samples: dict[str, dict] = {}
    for s in manifest["shards"]:
        path = os.path.join(out_dir, f"{manifest['prefix']}-{s['shard']:06d}.tar")
        with tarfile.open(path, mode="r") as tar:
            for m in tar.getmembers():
                key, ext = m.name.rsplit(".", 1)
                rec = samples.setdefault(key, {"key": key, "_shard": s["shard"]})
                rec[ext] = tar.extractfile(m).read()
    return sorted(samples.values(), key=lambda r: r["key"])
