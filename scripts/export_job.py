#!/usr/bin/env python
"""spark-submit entry for the WebDataset export job (scaling legs).

Exports EVERY image+caption pair of a fixture's payload table as
source-aligned WebDataset shards (operators/webdataset.export_image_captions,
``layout="source"`` — each payload file read exactly once) and prints one
JSON line with samples/sec.  Used by scripts/export_scaling_bench.py to
evidence the two-parallelism-level scaling of the training-export path, the
same way crawl_job.py evidences the frontier path.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--samples-per-shard", type=int, default=4096)
    ap.add_argument("--resize-px", type=int, default=0)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = SparkSession.builder.appName("crawler-spark-export-job")
    if args.cpus:
        b = b.master(f"local[{args.cpus}]").config(
            "spark.sql.shuffle.partitions", str(2 * args.cpus))
    spark = (
        b.config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from crawler_spark.operators.webdataset import export_image_captions

    images = spark.read.parquet(os.path.join(args.fixtures, "images.parquet"))
    samples = (
        images.select("image_id", "caption", "w", "h", "fmt", "phash")
        .withColumn("path", F.input_file_name())
    )
    # warm outside the measured span (JVM JIT + python worker spawn — the
    # round-0-exclusion methodology every bench in this repo uses)
    samples.count()
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    t0 = time.time()
    manifest = export_image_captions(
        samples, args.out, layout="source",
        samples_per_shard=args.samples_per_shard,
        resize_px=args.resize_px or None)
    wall = time.time() - t0
    out = {
        "metric": "wds_export_samples_per_sec",
        "value": round(manifest["n_samples"] / wall, 2),
        "unit": "samples/sec",
        "n_samples": manifest["n_samples"],
        "n_shards": len(manifest["shards"]),
        "bytes": int(sum(s["bytes"] for s in manifest["shards"])),
        "wall_s": round(wall, 2),
        "parallelism": spark.sparkContext.defaultParallelism,
    }
    spark.stop()
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
