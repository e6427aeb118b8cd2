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
         "--notify", notify, "--compact"],
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
    # --compact consolidated the fragment trees into scan-sized files
    comp = summary["exports"]["compacted"]
    assert comp["offers"]["rows"] == summary["offers"]
    assert comp["offers"]["files_out"] <= comp["offers"]["files_in"]
    assert os.path.isdir(os.path.join(wd, "compacted", "offers"))


def test_crawl_job_cli_revisit(tmp_path):
    """--revisit-from: the second run 304-skips every unchanged detail
    page and reports it in the summary; offers survive via carry."""
    wd_a, wd_b = str(tmp_path / "a"), str(tmp_path / "b")
    base = [sys.executable, os.path.join(REPO, "scripts", "crawl_job.py"),
            "--regions", "pomorskie", "--base-pages", "2",
            "--num-cpus", "4"]
    env = {**os.environ, "RAY_DEDUP_LOGS": "0"}
    p1 = subprocess.run(base + ["--workdir", wd_a], capture_output=True,
                        text=True, timeout=420, env=env)
    assert p1.returncode == 0, p1.stderr[-2000:]
    s1 = json.loads(p1.stdout.strip().splitlines()[-1])
    p2 = subprocess.run(base + ["--workdir", wd_b,
                                "--revisit-from", wd_a],
                        capture_output=True, text=True, timeout=420,
                        env=env)
    assert p2.returncode == 0, p2.stderr[-2000:]
    s2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert s1["not_modified"] == 0
    assert s2["not_modified"] > 0
    assert s2["offers"] == 0  # nothing parsed; rows carried on disk
    import pyarrow.parquet as pq
    carried = pq.read_table(os.path.join(
        wd_b, "offers", "gen-zcarry",
        os.listdir(os.path.join(wd_b, "offers", "gen-zcarry"))[0]))
    assert carried.num_rows == s1["offers"]
