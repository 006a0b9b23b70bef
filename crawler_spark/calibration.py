"""Host-interference calibration probes.

This sandbox is a microVM on a shared physical host.  Co-tenant load is
invisible from inside (ps shows nothing) but steals physical cores.  The
measured signature is a *stable* single-process time alongside a 4-way
parallel efficiency collapsing from ~0.95 to ~0.5-0.7 — which silently
halves any multi-core timing while the single-thread calibration still
reads "quiet".  Every benchmark in this repo therefore brackets its timed
section with :func:`cpu_probe` and records ``par_eff4`` in its JSON, so a
loud-window run is self-identifying (BASELINE.md "host interference").
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import time


def _sha_work(_arg=None) -> None:
    block = b"\x00" * (1 << 22)
    h = hashlib.sha256()
    for _ in range(16):
        h.update(block)


def cpu_probe() -> dict:
    """Single-process SHA-256 time over 64 MiB plus the 4-process parallel
    efficiency of the same workload (min-of-k to shrug off scheduler blips).

    ``par_eff4`` >= ~0.88 means the physical host was quiet; well under ~0.9
    means a co-tenant was stealing cores and any multi-core wall-clock taken
    in that window is untrustworthy (measured: identical engine rounds 130 s
    vs 230 s forty minutes apart, zero code change)."""
    t1 = float("inf")
    for _ in range(3):
        t0 = time.time()
        _sha_work()
        t1 = min(t1, time.time() - t0)
    t4 = float("inf")
    with mp.get_context("fork").Pool(4) as pool:
        for _ in range(2):
            t0 = time.time()
            pool.map(_sha_work, range(4))
            t4 = min(t4, time.time() - t0)
    return {"t1_s": round(t1, 3), "par_eff4": round(min(t1 / t4, 1.0), 3)}


def wait_quiet(min_eff: float, max_wait_s: float, poll_s: float = 45.0) -> dict:
    """Block until the 4-way probe efficiency reaches ``min_eff`` (quiet
    host) or ``max_wait_s`` elapses; returns the last probe either way."""
    deadline = time.time() + max_wait_s
    probe = cpu_probe()
    while probe["par_eff4"] < min_eff and time.time() < deadline:
        print(f"host busy (par_eff4={probe['par_eff4']}), waiting...", flush=True)
        time.sleep(poll_s)
        probe = cpu_probe()
    return probe
