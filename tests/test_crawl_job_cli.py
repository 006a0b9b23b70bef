"""End-to-end smoke of the spark-submit entry point (scripts/crawl_job.py):
the CLI must run a small crawl, verify payload invariants, resume from its
own checkpoint, and print one parseable JSON line."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def small_fix(tmp_path_factory):
    from crawler_spark.fixtures import generate

    d = str(tmp_path_factory.mktemp("clifix"))
    generate(d, n_pages=96, n_hosts=4, seed=5, image_shards=4)
    return d


def _run(args):
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1", SPARK_GRAFT_DRIVER_MEM="2g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "crawl_job.py"), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)

def test_crawl_job_cli_run_and_resume(small_fix, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("clickpt"))
    r1 = _run(
        ["--fixtures", small_fix, "--ckpt", ckpt, "--cpus", "2",
         "--rounds", "2", "--ingest-payloads"]
    )
    assert r1["metric"] == "frontier_urls_per_sec"
    assert r1["selected"] > 0 and r1["fetched"] > 0
    assert r1["payload_checked"] > 0 and r1["payload_ok"] is True
    # resume continues from the committed rounds instead of restarting
    r2 = _run(
        ["--fixtures", small_fix, "--ckpt", ckpt, "--cpus", "2",
         "--rounds", "4", "--resume", "--ingest-payloads"]
    )
    assert r2["url_seen"] >= r1["url_seen"]
    assert r2["payload_ok"] is True


def test_crawl_job_cli_exports(small_fix, tmp_path_factory):
    """--export-wds / --export-warc run the post-crawl handoffs and the
    summary reports their manifests."""
    ckpt = str(tmp_path_factory.mktemp("clickpt_e"))
    wds = str(tmp_path_factory.mktemp("cliwds"))
    warc = str(tmp_path_factory.mktemp("cliwarc"))
    r = _run(
        ["--fixtures", small_fix, "--ckpt", ckpt, "--cpus", "2",
         "--rounds", "2", "--export-wds", wds, "--export-resize-px", "8",
         "--export-warc", warc]
    )
    assert r["exports"]["webdataset"]["n"] > 0
    assert r["exports"]["warc"]["n"] > 0
    from crawler_spark.operators.webdataset import read_webdataset_dir

    samples = read_webdataset_dir(wds)
    assert len(samples) == r["exports"]["webdataset"]["n"]
    assert all("png" in s and "txt" in s and "json" in s for s in samples)
    assert os.path.exists(os.path.join(warc, "_manifest.json"))
    assert os.path.isdir(os.path.join(warc, "cdx"))


def test_crawl_job_cli_trap_report_and_refetch(small_fix, tmp_path_factory):
    """--trap-report writes the spider-trap profile and reports the flagged
    count; --refetch-cdx seeds the next run from a cdx diff (identical
    archives -> empty refetch plan -> the crawl selects nothing)."""
    ckpt = str(tmp_path_factory.mktemp("clickpt_t"))
    warc = str(tmp_path_factory.mktemp("cliwarc_t"))
    trap = str(tmp_path_factory.mktemp("clitrap"))
    r = _run(
        ["--fixtures", small_fix, "--ckpt", ckpt, "--cpus", "2",
         "--rounds", "2", "--export-warc", warc,
         "--trap-report", trap, "--trap-budget", "2"]
    )
    assert isinstance(r["trap_hosts_flagged"], int)
    assert r["trap_hosts_flagged"] >= 1  # fixture pages are numeric-id paths
    cdx = os.path.join(warc, "cdx")
    ckpt2 = str(tmp_path_factory.mktemp("clickpt_t2"))
    r2 = _run(
        ["--fixtures", small_fix, "--ckpt", ckpt2, "--cpus", "2",
         "--rounds", "2", "--refetch-cdx", f"{cdx},{cdx}"]
    )
    assert r2["selected"] == 0  # nothing changed between identical archives
