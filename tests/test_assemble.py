"""End-to-end training-set assembly: funnel monotonicity, sharded
output layout, resume-skip semantics, per-shard packing invariants."""

import json
import os

import numpy as np
import pyarrow.parquet as pq

from realestate_scraper_ray.pipelines.assemble import (
    assemble_training_set, read_assembled,
)

SF = "/root/testdata/sf0.001"


def test_assemble_funnel_layout_and_packing(tmp_path, ray_session):
    out = str(tmp_path / "assembled")
    m = assemble_training_set(SF, out)
    assert m["n_in"] >= m["n_after_quality"] >= m["n_after_temperature"] > 0
    total = 0
    for shard, n in m["shard_rows"].items():
        p = os.path.join(out, f"shard={shard}", "part.parquet")
        assert pq.ParquetFile(p).metadata.num_rows == n
        total += n
    assert total == m["n_after_temperature"]
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f) == m

    df = read_assembled(out).to_pandas()
    # per-shard invariants: pos is 1..n in file order; pack_bin is the
    # exclusive token prefix sum // bin_tokens, and never skips bins
    for shard, g in df.groupby("shard"):
        g = g.sort_values("pos").reset_index(drop=True)
        assert list(g["pos"]) == list(range(1, len(g) + 1))
        off = np.concatenate([[0], np.cumsum(g["n_tokens"].to_numpy())[:-1]])
        assert (g["pack_bin"].to_numpy() == off // m["bin_tokens"]).all()
        assert (np.diff(g["pack_bin"].to_numpy()) >= 0).all()


def test_assemble_resume_skips_existing_shards(tmp_path, ray_session):
    out = str(tmp_path / "assembled")
    m1 = assemble_training_set(SF, out)
    victims = m1["written"][:2]
    mtimes = {
        s: os.path.getmtime(os.path.join(out, f"shard={s}", "part.parquet"))
        for s in victims}
    m2 = assemble_training_set(SF, out)
    assert set(m2["skipped"]) == set(m1["written"])
    assert m2["written"] == []
    for s in victims:  # untouched bytes on resume
        assert os.path.getmtime(
            os.path.join(out, f"shard={s}", "part.parquet")) == mtimes[s]
    assert m2["shard_rows"] == m1["shard_rows"]


def test_assemble_deterministic_across_runs(tmp_path, ray_session):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    assemble_training_set(SF, a)
    assemble_training_set(SF, b)
    da = read_assembled(a).to_pandas().sort_values(["shard", "pos"])
    db = read_assembled(b).to_pandas().sort_values(["shard", "pos"])
    assert da.reset_index(drop=True).equals(db.reset_index(drop=True))
