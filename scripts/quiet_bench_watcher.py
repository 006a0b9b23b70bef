#!/usr/bin/env python
"""Quiet-window watcher for the full-registry bench record.

This sandbox shares a physical host with invisible co-tenants
(crawler_spark.calibration docstring); clean benchmark windows are scarce
and unpredictable, so round 3's record-keeping standard is "all four probe
brackets >= 0.85" (VERDICT r3 item 3) — a bar only a watcher loop can hit.
This script loops:

1. self-load guard: refuse while any pytest / spark-submit / other bench
   lives (our own load would read as a co-tenant and burn the window);
2. gate: ``wait_quiet`` on BOTH probe kernels (ALU par_eff4 AND DRAM
   bw_eff4 >= --min-eff);
3. run ``bench.py`` (which self-brackets with the same probes);
4. accept iff all four in-bench brackets (par/bw x before/after) pass;
   write the accepted JSON to --out and exit 0.

Run it in the background overnight:
    nohup python scripts/quiet_bench_watcher.py --out BENCH_QUIET.json &
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from crawler_spark.calibration import cpu_probe, wait_quiet  # noqa: E402


def our_load_live() -> list[str]:
    """Command lines of our own heavy processes (pytest, spark-submit,
    scaling/bench scripts) — windows must not be burned on self-load."""
    me = os.getpid()
    hits = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="replace")
        except OSError:
            continue
        if any(tok in cmd for tok in
               ("pytest", "SparkSubmit", "spark-submit", "scaling_bench",
                "bench.py")):
            hits.append(cmd[:120])
    return hits


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_QUIET_50Q.json"))
    ap.add_argument("--min-eff", type=float, default=0.85)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--max-hours", type=float, default=12.0)
    ap.add_argument("--poll-s", type=float, default=60.0)
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    attempt = 0
    while time.time() < deadline:
        busy = our_load_live()
        if busy:
            print(f"self-load live ({len(busy)}): {busy[0]} — holding",
                  flush=True)
            time.sleep(args.poll_s)
            continue
        probe = wait_quiet(args.min_eff, args.poll_s * 5,
                           min_bw_eff=args.min_eff)
        if probe["min_eff4"] < args.min_eff:
            continue
        if our_load_live():
            continue  # something of ours started during the gate wait
        attempt += 1
        print(f"attempt {attempt}: gate probe par={probe['par_eff4']} "
              f"bw={probe['bw_eff4']} — running bench", flush=True)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf_dir,
                   SPARK_GRAFT_CPUS=args.cpus)
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           cwd=REPO, env=env, capture_output=True, text=True)
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            res = json.loads(line)
        except json.JSONDecodeError:
            print(f"bench failed (rc={r.returncode}): {r.stderr[-400:]}",
                  flush=True)
            time.sleep(args.poll_s)
            continue
        brackets = {k: res.get(k) for k in
                    ("par_eff4_before", "par_eff4_after",
                     "bw_eff4_before", "bw_eff4_after")}
        if all(v is not None and v >= args.min_eff for v in brackets.values()):
            res["gate_probe"] = probe
            with open(args.out, "w") as f:
                json.dump(res, f, indent=1)
            print(f"ACCEPTED ({brackets}) -> {args.out}", flush=True)
            return
        print(f"rejected: brackets {brackets}", flush=True)
    print("deadline reached without a clean window", flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
