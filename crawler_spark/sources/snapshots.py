"""Iceberg-style snapshotted state store over Parquet (SURVEY.md §7).

No Iceberg runtime jars in this container, so we implement the part of its
contract the engine needs — ATOMIC, RESUMABLE round commits with manifest
metadata — directly over Parquet:

* each round writes its tables under ``<ckpt>/round=NNNN/<table>/``
* a ``MANIFEST.json`` is written LAST via tmp-file + ``os.replace`` (atomic
  on POSIX); a round directory without a manifest is an uncommitted torn
  write and is ignored + cleaned on resume
* append-only tables (url_seen, dead_letter, fetch_log, lineage) are stored
  as per-round DELTAS and unioned on read — the Iceberg manifest-list
  pattern, so a round's commit cost is O(round output), not O(total state)
* the mutable frontier is stored in full each round (it is the working set;
  at 100 TB scale this becomes an Iceberg row-delta table, the layout and
  commit protocol here are deliberately swap-compatible)

Swap path to real Iceberg: point ``spark.sql.catalog.crawl`` at an Iceberg
catalog and replace ``commit_round``/``read_*`` with MERGE/snapshot reads;
the engine only touches this module for state IO.
"""

from __future__ import annotations

import json
import os
import shutil
import time as _time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "MANIFEST.json"
FULL_TABLES = ("frontier", "bloom")
DELTA_TABLES = (
    "url_seen", "dead_letter", "fetch_log", "story_results", "lineage",
    "payload_log", "task_trace",
)


def _round_dir(ckpt_dir: str, rnd: int) -> str:
    return os.path.join(ckpt_dir, f"round={rnd:05d}")


def commit_round(
    ckpt_dir: str,
    rnd: int,
    tables: dict[str, DataFrame],
    meta: Optional[dict] = None,
    blobs: Optional[dict[str, bytes]] = None,
    compacted: tuple[str, ...] = (),
) -> dict:
    """Write a round's tables, then the manifest (the atomic commit point).

    A table named in ``compacted`` is a FULL snapshot (all history folded
    in): ``read_deltas`` starts its union there instead of round 0 — the
    Iceberg rewrite-manifests pattern, keeping both the file-listing fan-in
    and the union-plan width O(rounds-since-compaction) on long crawls.

    Table writes run as CONCURRENT Spark jobs (thread pool): the per-round
    deltas are independent outputs of the same persisted round state, so
    overlapping them hides per-job scheduling latency — the batch analog of
    a multi-sink write.  ``blobs`` are small driver-side sidecar files (e.g.
    serialized Bloom bits) stored beside the tables under the same atomic
    manifest.
    """
    rdir = _round_dir(ckpt_dir, rnd)
    if os.path.exists(rdir):
        shutil.rmtree(rdir)  # torn previous attempt for this round
    os.makedirs(rdir, exist_ok=True)
    manifest: dict = {"round": rnd, "tables": {}, "blobs": [], "meta": meta or {}}

    def _write(item):
        name, df = item
        path = os.path.join(rdir, name)
        t0 = _time.time()
        df.write.mode("overwrite").parquet(path)
        if os.environ.get("SPARK_GRAFT_DEBUG_TIMING"):
            print(f"TIMING   write {name}: {_time.time() - t0:.1f}s", flush=True)
        return name, path

    n_workers = int(os.environ.get("SPARK_GRAFT_COMMIT_THREADS", len(tables)) or 1)
    with ThreadPoolExecutor(max_workers=max(1, n_workers)) as ex:
        for name, path in ex.map(_write, tables.items()):
            manifest["tables"][name] = {"path": path, "compacted": name in compacted}
    for fname, data in (blobs or {}).items():
        with open(os.path.join(rdir, fname), "wb") as f:
            f.write(data)
        manifest["blobs"].append(fname)
    tmp = os.path.join(rdir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(rdir, MANIFEST))  # commit
    return manifest


def committed_rounds(ckpt_dir: str) -> list[int]:
    """Rounds with a valid manifest, ascending; torn dirs are skipped."""
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for d in sorted(os.listdir(ckpt_dir)):
        if d.startswith("round=") and os.path.exists(os.path.join(ckpt_dir, d, MANIFEST)):
            out.append(int(d.split("=")[1]))
    return out


def latest_round(ckpt_dir: str) -> Optional[int]:
    rounds = committed_rounds(ckpt_dir)
    return rounds[-1] if rounds else None


def clean_uncommitted(ckpt_dir: str) -> list[str]:
    """Drop round dirs lacking a manifest (torn writes from a crash)."""
    removed = []
    if not os.path.isdir(ckpt_dir):
        return removed
    for d in os.listdir(ckpt_dir):
        p = os.path.join(ckpt_dir, d)
        if d.startswith("round=") and not os.path.exists(os.path.join(p, MANIFEST)):
            shutil.rmtree(p)
            removed.append(p)
    return removed


def read_full(spark: SparkSession, ckpt_dir: str, name: str, rnd: int) -> DataFrame:
    return spark.read.parquet(os.path.join(_round_dir(ckpt_dir, rnd), name))


def read_manifest(ckpt_dir: str, rnd: int) -> Optional[dict]:
    """The committed manifest for a round (None if uncommitted/missing)."""
    p = os.path.join(_round_dir(ckpt_dir, rnd), MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_blob(ckpt_dir: str, fname: str, rnd: int) -> Optional[bytes]:
    p = os.path.join(_round_dir(ckpt_dir, rnd), fname)
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return f.read()


def read_deltas(
    spark: SparkSession, ckpt_dir: str, name: str, upto_round: int
) -> Optional[DataFrame]:
    """Union of a delta table across committed rounds ≤ upto_round, starting
    from the table's most recent COMPACTED snapshot (see commit_round)."""
    rounds = [r for r in committed_rounds(ckpt_dir) if r <= upto_round]
    start = 0
    for i, r in enumerate(rounds):
        entry = ((read_manifest(ckpt_dir, r) or {}).get("tables") or {}).get(name) or {}
        if entry.get("compacted"):
            start = i
    paths = []
    for r in rounds[start:]:
        p = os.path.join(_round_dir(ckpt_dir, r), name)
        if os.path.exists(p):
            paths.append(p)
    if not paths:
        return None
    return spark.read.parquet(*paths)
