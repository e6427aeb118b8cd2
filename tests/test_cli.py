"""Smoke test for the user-facing cluster job entrypoint
(scripts/crawl_job.py): run it as a real subprocess (its own Ray
session), assert the summary JSON and every migration export land."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_crawl_job_cli_with_exports(tmp_path):
    wd = str(tmp_path / "wd")
    csvd = str(tmp_path / "csv")
    log = str(tmp_path / "live_all.log")
    notify = str(tmp_path / "notify.jsonl")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "crawl_job.py"),
         "--workdir", wd, "--regions", "pomorskie", "--base-pages", "2",
         "--num-cpus", "4", "--export-csv", csvd, "--export-log", log,
         "--notify", notify],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["pages"] > 0 and summary["offers"] > 0
    assert summary["generations"] >= 1
    assert summary["exports"]["notified"] == summary["offers"]
    for name in ("urls.csv", "offers.csv", "photos.csv"):
        assert os.path.getsize(os.path.join(csvd, name)) > 0
    assert os.path.getsize(log) > 0
    rows = [json.loads(x) for x in open(notify)]
    assert len(rows) == summary["offers"]
    assert all(set(r) == {"apartment_id"} for r in rows)
    # state checkpoint on disk -> --resume is a no-op continuation
    assert os.path.isdir(os.path.join(wd, "checkpoint"))
