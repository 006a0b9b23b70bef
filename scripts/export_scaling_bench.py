#!/usr/bin/env python
"""Two-parallelism-level scaling evidence for the training-export path.

Same methodology as scripts/scaling_bench.py (which covers the frontier
job): the SAME source-aligned WebDataset export (scripts/export_job.py) runs
in fresh spark-submit --py-files JVMs at N and 4N cores over the SAME cached
payload fixture; efficiency = thr_4N / (4 · thr_N).  Legs are probe-gated
(pre-wait on ALU+bandwidth quiet, 45 s mid-leg ALU monitor, post probe) —
see BASELINE.md "host interference".

The export is one linear pass over the payload files (each read exactly
once; parallelism unit = payload file count, fixture shards ≥ 4N by
construction), so near-linear scaling is the design claim being evidenced.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
sys.path.insert(0, REPO)

from crawler_spark.calibration import cpu_probe, wait_quiet  # noqa: E402
from scripts.scaling_bench import build_pyfiles_zip  # noqa: E402


def run_level(cpus: int, fixtures: str, zpath: str, args,
              during: list | None = None) -> dict:
    out_dir = os.path.join(CACHE, f"export_scale_{cpus}")
    json_out = os.path.join(CACHE, f"export_scale_{cpus}.json")
    cmd = [
        "spark-submit",
        "--master", f"local[{cpus}]",
        "--driver-memory", "16g",
        "--py-files", zpath,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--conf", f"spark.sql.shuffle.partitions={2 * cpus}",
        "--conf", "spark.sql.adaptive.enabled=false",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        os.path.join(REPO, "scripts", "export_job.py"),
        "--fixtures", fixtures,
        "--out", out_dir,
        "--samples-per-shard", str(args.samples_per_shard),
        "--json-out", json_out,
    ]
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    monitor = None
    if during is not None:
        import threading

        stop = threading.Event()

        def _mon():
            while not stop.wait(45.0):
                during.append(cpu_probe()["par_eff4"])

        monitor = (stop, threading.Thread(target=_mon, daemon=True))
        monitor[1].start()
    try:
        subprocess.run(cmd, check=True, cwd=REPO, env=env,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    finally:
        if monitor is not None:
            monitor[0].set()
            monitor[1].join(timeout=5)
        shutil.rmtree(out_dir, ignore_errors=True)
    with open(json_out) as f:
        return json.loads(f.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=655360)
    ap.add_argument("--hosts", type=int, default=1024)
    ap.add_argument("--seeds", type=int, default=327680)
    ap.add_argument("--px", type=int, nargs="+", default=[64])
    ap.add_argument("--fmts", nargs="+", default=["png"])
    ap.add_argument("--shards", type=int, default=128)
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--xn", type=int, default=4)
    ap.add_argument("--samples-per-shard", type=int, default=4096)
    ap.add_argument("--wait-quiet", action="store_true")
    ap.add_argument("--quiet-eff", type=float, default=0.88)
    ap.add_argument("--quiet-bw-eff", type=float, default=0.8)
    ap.add_argument("--max-wait-s", type=float, default=7200)
    ap.add_argument("--max-leg-tries", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(CACHE, "BENCH_EXPORT_SCALING.json"))
    args = ap.parse_args()

    from crawler_spark.fixtures import ensure_cached

    fixtures = ensure_cached(
        CACHE, args.pages, args.hosts, n_seeds=args.seeds, img_px=args.px,
        image_shards=args.shards, fmts=args.fmts)
    zpath = build_pyfiles_zip()

    def leg(cpus: int):
        for attempt in range(args.max_leg_tries):
            if args.wait_quiet:
                pre = wait_quiet(args.quiet_eff, args.max_wait_s,
                                 min_bw_eff=args.quiet_bw_eff)
                if (pre["par_eff4"] < args.quiet_eff
                        or pre["bw_eff4"] < args.quiet_bw_eff):
                    raise SystemExit("no quiet window before max-wait-s")
            else:
                pre = cpu_probe()
            during: list = []
            res = run_level(cpus, fixtures, zpath, args, during=during)
            post = cpu_probe()
            mid_ok = all(d >= args.quiet_eff - 0.05 for d in during)
            if not args.wait_quiet or (
                    post["par_eff4"] >= args.quiet_eff - 0.05 and mid_ok):
                return res, pre, post, during
            print(f"leg local[{cpus}] rejected (post={post['par_eff4']} "
                  f"mid={during})", flush=True)
        raise SystemExit(f"leg local[{cpus}] never quiet")

    res_n, pre_n, post_n, dur_n = leg(args.n)
    res_xn, pre_xn, post_xn, dur_xn = leg(args.xn)
    factor = args.xn / args.n
    eff = res_xn["value"] / (factor * res_n["value"])
    out = {
        "metric": "export_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": args.n,
        "xn_cores": args.xn,
        "throughput_n": res_n["value"],
        "throughput_xn": res_xn["value"],
        "n_samples": res_n["n_samples"],
        "bytes": res_n["bytes"],
        "wall_n_s": res_n["wall_s"],
        "wall_xn_s": res_xn["wall_s"],
        "layout": "source",
        "launcher": "spark-submit --py-files crawler_spark.zip",
        "calib_probes": {"n_pre": pre_n, "n_post": post_n, "n_during": dur_n,
                         "xn_pre": pre_xn, "xn_post": post_xn,
                         "xn_during": dur_xn},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
