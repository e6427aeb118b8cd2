"""10x portal stress crawl (round-5 verdict ask #5).

Scales the bench portal's region breadth 10x (960 regions x 4 sources,
~880k pages) and runs the WINDOWED crawl (max_wave_rows bounds every
generation's execution) at 32 CPUs, answering the open 100-TB
questions that had only been measured at 88k pages:

1. throughput: pages/s within ~15 % of the 88k-page bench rate
   (frontier windowing + checkpoint cost must not grow with frontier
   size);
2. kill/resume at scale: a run stopped mid-crawl and resumed must
   produce BYTE-IDENTICAL output tables to an uninterrupted run.

Usage: python scripts/stress_crawl.py [--regions N] [--wave W]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench helpers: portal + warm-up)


def _table_hash(res, name: str) -> str:
    """Order-insensitive content hash of an output table."""
    import pyarrow as pa

    t = res.table(name)
    if t.num_rows == 0:
        return "empty"
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regions", type=int, default=960)
    ap.add_argument("--wave", type=int, default=65536)
    ap.add_argument("--stop-after", type=int, default=3,
                    help="generations before the simulated kill")
    args = ap.parse_args()

    from realestate_scraper_ray.config import CrawlConfig, PortalConfig
    from realestate_scraper_ray.pipelines.crawl import run_crawl

    ncpu = bench._num_cpus()
    bench._init_ray(ncpu)

    # 10x the bench portal's breadth: regions are the axis a multi-node
    # crawl scales on (hosts x regions = frontier width)
    regions = tuple(f"miasto-{chr(97 + i)}{chr(97 + j)}{chr(97 + k)}"
                    for i in range(8) for j in range(12)
                    for k in range(args.regions // 96))
    pcfg = PortalConfig(regions=regions, **bench.BENCH_PORTAL)
    ccfg = CrawlConfig(
        fetch_batch_size=256,
        urlseen_shards=max(2, ncpu // 4),
        urlseen_capacity=1 << 22,  # ~4M keys for ~900k URLs
        checkpoint_every=2, checkpoint_full_every=4,
        max_wave_rows=args.wave)

    bench._warm_workers(pcfg, ncpu)

    base = tempfile.mkdtemp(prefix="stress_crawl_")
    out: dict = {"regions": len(regions), "num_cpus": ncpu,
                 "max_wave_rows": args.wave}
    try:
        # --- uninterrupted reference run -------------------------------
        t0 = time.time()
        res_a = run_crawl(pcfg, ccfg, os.path.join(base, "a"))
        dt_a = time.time() - t0
        pages = res_a.pages_fetched + res_a.pages_failed
        out.update(pages=pages, offers=res_a.offers,
                   generations=res_a.generations,
                   sec_uninterrupted=round(dt_a, 1),
                   pages_per_sec=round(pages / dt_a, 1))
        hashes_a = {n: _table_hash(res_a, n)
                    for n in ("urls", "offers", "photos")}

        # --- kill mid-run, then resume ---------------------------------
        wd_b = os.path.join(base, "b")
        t0 = time.time()
        run_crawl(pcfg, ccfg, wd_b, stop_after_generations=args.stop_after)
        dt_kill = time.time() - t0
        t0 = time.time()
        res_b = run_crawl(pcfg, ccfg, wd_b, resume=True)
        dt_res = time.time() - t0
        hashes_b = {n: _table_hash(res_b, n)
                    for n in ("urls", "offers", "photos")}
        out.update(sec_before_kill=round(dt_kill, 1),
                   sec_resume=round(dt_res, 1),
                   resume_identical=(hashes_a == hashes_b),
                   table_hashes=hashes_a)
        if hashes_a != hashes_b:
            out["hashes_resumed"] = hashes_b
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
