#!/usr/bin/env python
"""Per-round benchmark (driver contract): headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32), plus the engine's own headline —
frontier crawl throughput on a cached synthetic web (fetch + canonicalize +
dedup + snapshot commit, plans/engine.py).

Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "frontier_urls_per_sec": ..., ...}

Scaling evidence (local[1] vs local[4] by default — the un-contended N→4N
pair, BASELINE.md) is produced separately
by scripts/scaling_bench.py — it needs fresh JVMs per parallelism level, which
a single-session bench cannot provide.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# crawl-throughput micro-bench shape (kept small: this runs every round)
CRAWL_PAGES = 8192
CRAWL_HOSTS = 64
CRAWL_ROUNDS = 4


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _materialize(df) -> None:
    # noop sink: full execution incl. Python/pandas UDFs, zero collect cost
    df.write.format("noop").mode("overwrite").save()


def _warmup(spark) -> None:
    """JVM JIT + codegen + Python-worker spawn warm-up, excluded from the
    timed loop — the same round-0-exclusion methodology scaling_bench uses
    (BASELINE.md).  Touches each execution path once (range agg, parquet
    scan+agg, Arrow pandas-UDF round trip) without running any REGISTRY
    query, so no per-query result is pre-computed."""
    from pyspark.sql.functions import col, pandas_udf

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    n.filter(col("n_nationkey") >= 0).agg({"n_nationkey": "max"}).collect()

    def _ident(s):
        return s

    spark.range(1000).select(pandas_udf(_ident, "long")(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()


def bench_queries(spark) -> dict[str, float]:
    from crawler_spark.queries import REGISTRY

    _warmup(spark)
    timings: dict[str, float] = {}
    for name, (fn, _sql) in REGISTRY.items():
        t0 = time.time()
        _materialize(fn(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
        # isolate queries: several (q17/q18/q25/q34) materialize shared
        # intermediates via localCheckpoint; blocks are released by the
        # ContextCleaner on driver GC, which natural allocation pressure
        # provides (verified: no late-query slowdown at sf0.01/sf0.1 —
        # round 2's 2× accumulation effect came from Dataset persists, which
        # clearCache drops).  An explicit per-query System.gc() was tried and
        # REVERTED: the forced full GCs made later queries 2-3× slower.
        spark.catalog.clearCache()
    return timings


def bench_calibration(spark) -> dict:
    """Host-noise control: two fixed workloads whose cost is independent of
    this repo's code.  Both were measured to swing ~3x on this box between
    quiet and noisy windows, so recording them alongside the query timings
    lets a reader separate engine regressions from host weather.

    - calib_cpu_s: single-thread SHA-256 over 64 MiB (pure CPU, no Spark).
    - calib_shuffle_s: a fixed 2M-row repartition+agg job (Spark scheduler +
      shuffle fixed costs; run post-warmup so JIT is excluded).

    Neither sees the signal that actually matters on this box — co-tenant
    load steals *parallel* headroom while single-thread speed stays flat —
    so main() additionally brackets the whole bench with
    calibration.cpu_probe (par_eff4_before/after in the JSON).
    """
    import hashlib

    t0 = time.time()
    h = hashlib.sha256()
    block = b"\x00" * (1 << 20)
    for _ in range(64):
        h.update(block)
    cpu_s = time.time() - t0

    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(2_000_000).repartition(32, "id").groupBy(
        F.pmod("id", F.lit(97))
    ).count().write.format("noop").mode("overwrite").save()
    shuffle_s = time.time() - t0
    return {"calib_cpu_s": round(cpu_s, 3), "calib_shuffle_s": round(shuffle_s, 3)}


def bench_crawl(spark) -> dict:
    from crawler_spark.fixtures import ensure_cached
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig

    fix = ensure_cached(CACHE, CRAWL_PAGES, CRAWL_HOSTS)
    ckpt = os.path.join(CACHE, "bench_ckpt")
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    cfg = CrawlConfig(round_seconds=64.0, max_burst_per_host=4096, max_rounds=CRAWL_ROUNDS)
    eng = CrawlEngine(spark, fix, ckpt, cfg=cfg)
    eng.pages.count()  # cache warm-up outside the measured span
    t0 = time.time()
    summary = eng.run()
    wall = time.time() - t0

    # post-crawl handoff sinks (timed separately — export jobs, not frontier
    # work): WebDataset image+caption shards via the zero-byte-shuffle direct
    # path, and the WARC/1.1 + cdx archive
    wds_dir = os.path.join(CACHE, "bench_wds")
    warc_dir = os.path.join(CACHE, "bench_warc")
    for d in (wds_dir, warc_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    t0 = time.time()
    wds = eng.export_webdataset(wds_dir, n_shards=64)
    wds_s = time.time() - t0
    t0 = time.time()
    warc = eng.export_warc(warc_dir, n_files=16)
    warc_s = time.time() - t0
    for d in (wds_dir, warc_dir):
        shutil.rmtree(d, ignore_errors=True)

    return {
        "frontier_urls_per_sec": round(summary["selected"] / wall, 2),
        "frontier_wall_s": round(wall, 2),
        "frontier_selected": summary["selected"],
        "frontier_rounds": summary["rounds"],
        "wds_export_samples_per_sec": round(wds["n_samples"] / wds_s, 2),
        "wds_export_samples": wds["n_samples"],
        "warc_export_records_per_sec": round(warc["n_records"] / warc_s, 2),
        "warc_export_records": warc["n_records"],
    }


def main() -> None:
    from pyspark.sql import SparkSession

    from crawler_spark.calibration import cpu_probe

    probe_before = cpu_probe()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("crawler-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(32, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings = bench_queries(spark)
    calib = bench_calibration(spark)
    crawl = bench_crawl(spark)
    spark.stop()
    probe_after = cpu_probe()

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "cpus": CPUS,
        **calib,
        # 4-process parallel-efficiency brackets: if either reads well under
        # ~0.9, a co-tenant on the shared physical host was stealing cores
        # during this bench and the multi-core timings above are inflated
        # (crawler_spark/calibration.py, BASELINE.md "host interference")
        "par_eff4_before": probe_before["par_eff4"],
        "par_eff4_after": probe_after["par_eff4"],
        # bandwidth-fairness twin (calibration._bw_work): an ALU-fair but
        # DRAM-saturating co-tenant passes par_eff4 while still slowing
        # Spark — bw_eff4 makes that window self-identifying too
        "bw_eff4_before": probe_before["bw_eff4"],
        "bw_eff4_after": probe_after["bw_eff4"],
        "probe_t1_s": probe_before["t1_s"],
        **crawl,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
