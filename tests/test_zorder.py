"""Z-order layout stage (stages/zorder.py): morton kernel vs a
bit-by-bit reference, bucket locality, and the clustered resumable
writer (SQL-oracle parity for lineitem_zorder_stats runs via
tools/check_correctness.py)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from realestate_scraper_ray.stages.zorder import (
    morton_key, z_bucket, zorder_write,
)


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_kernel_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 65536, 2000)
    y = rng.integers(0, 65536, 2000)
    got = morton_key(x, y)
    exp = np.array([_morton_ref(int(a), int(b)) for a, b in zip(x, y)],
                   np.uint64)
    assert (got == exp).all()
    # quantization divisors participate in the key
    assert (morton_key(x, y, x_div=16, y_div=4)
            == np.array([_morton_ref(int(a) // 16, int(b) // 4)
                         for a, b in zip(x, y)], np.uint64)).all()


def test_morton_rejects_overflow():
    with pytest.raises(ValueError):
        morton_key(np.array([70000]), np.array([0]))


def test_bucket_locality():
    # a z-bucket (top 6 bits of 32) covers at most a 1/8 band of each
    # 16-bit dimension: buckets share the top 3 bits of x AND of y
    rng = np.random.default_rng(1)
    x = rng.integers(0, 65536, 20000)
    y = rng.integers(0, 65536, 20000)
    zb = z_bucket(morton_key(x, y))
    for b in np.unique(zb):
        m = zb == b
        assert len(np.unique(x[m] >> 13)) == 1
        assert len(np.unique(y[m] >> 13)) == 1


def test_zorder_write_layout_and_resume(ray_session, tmp_path):
    rng = np.random.default_rng(2)
    n = 5000
    t = pa.table({"x": pa.array(rng.integers(0, 60000, n).astype(np.int64)),
                  "y": pa.array(rng.integers(0, 60000, n).astype(np.int64)),
                  "payload": pa.array(np.arange(n, dtype=np.int64))})
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=512)
    out = str(tmp_path / "zout")
    res = zorder_write(rd.read_parquet(str(src)), out, "x", "y",
                       n_bucket_bits=4)
    assert res["rows"] == n and res["skipped"] == 0
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(files) == res["files"] <= 16
    # round-trip: every payload row lands exactly once, sorted by z
    # within each file, and the file's rows all share the bucket id
    seen = []
    for f in files:
        body = pq.read_table(os.path.join(out, f))
        zb = z_bucket(morton_key(body["x"].to_numpy(),
                                 body["y"].to_numpy()), 4)
        assert len(np.unique(zb)) == 1
        assert f == f"z={int(zb[0]):02d}.parquet"
        z = morton_key(body["x"].to_numpy(), body["y"].to_numpy())
        assert (np.diff(z.view(np.int64)) >= 0).all()
        seen.append(body["payload"].to_numpy())
    assert sorted(np.concatenate(seen).tolist()) == list(range(n))
    # resume: a re-run skips every finished bucket and rewrites nothing
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    res2 = zorder_write(rd.read_parquet(str(src)), out, "x", "y",
                        n_bucket_bits=4)
    assert res2["skipped"] == res2["files"] == res["files"]
    assert all(os.path.getmtime(os.path.join(out, f)) == m
               for f, m in mtimes.items())
