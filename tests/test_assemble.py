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


def test_assemble_shard_count_scales(tmp_path, ray_session):
    """shard_hex_digits=k gives 16**k-way sharding: same survivor set and
    per-doc token counts as k=1, shard = first k hex digits of the
    shuffle key, every per-shard invariant intact — the knob that keeps
    one packing task ~= one block at any scale."""
    import hashlib

    a = str(tmp_path / "k1")
    b = str(tmp_path / "k2")
    m1 = assemble_training_set(SF, a, shard_hex_digits=1)
    m2 = assemble_training_set(SF, b, shard_hex_digits=2)
    assert m2["shard_hex_digits"] == 2
    # identical funnel: sharding must not change WHICH docs survive
    assert m1["n_after_temperature"] == m2["n_after_temperature"]
    d1 = read_assembled(a).to_pandas()
    d2 = read_assembled(b).to_pandas()
    assert sorted(d1["doc_id"]) == sorted(d2["doc_id"])
    assert (d1.set_index("doc_id")["n_tokens"].sort_index()
            .equals(d2.set_index("doc_id")["n_tokens"].sort_index()))
    # shard IS the first 2 hex digits of md5('ep1:'||doc_id)
    hv = {i: hashlib.md5(f"ep1:{i}".encode()).hexdigest()
          for i in d2["doc_id"]}
    assert all(s == hv[i][:2] for i, s in zip(d2["doc_id"], d2["shard"]))
    assert len(set(d2["shard"])) > len(set(d1["shard"]))
    # intra-shard invariants hold at k=2 too
    for shard, g in d2.groupby("shard"):
        g = g.sort_values("pos").reset_index(drop=True)
        assert list(g["pos"]) == list(range(1, len(g) + 1))
        off = np.concatenate([[0], np.cumsum(g["n_tokens"].to_numpy())[:-1]])
        assert (g["pack_bin"].to_numpy() == off // m2["bin_tokens"]).all()


def test_epoch_shuffle_shard_digits(ray_session):
    """epoch_shuffle_ds(k=2) re-ranks within 256 shards; doc set and
    relative hv-order inside any k=1 shard prefix are preserved."""
    import ray.data as rd

    from realestate_scraper_ray.pipelines.relational import epoch_shuffle_ds

    ds = rd.read_parquet(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id"])
    k1 = epoch_shuffle_ds(ds, 1).to_pandas()
    k2 = epoch_shuffle_ds(ds, 2).to_pandas()
    assert sorted(k1["doc_id"]) == sorted(k2["doc_id"])
    assert set(k2["shard"].str.len()) == {2}
    assert set(k2["shard"].str[:1]) <= set(k1["shard"])
    # k=2 shards partition each k=1 shard: per-shard pos is 1..n
    for _, g in k2.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))


def test_assemble_refuses_parameter_remix(tmp_path, ray_session):
    """Re-running into an out_dir written with different parameters
    must refuse loudly: stale shard widths would DUPLICATE the corpus
    in read_assembled, and changed bin_tokens would mix shard
    contents behind skip-if-exists."""
    import pytest

    out = str(tmp_path / "remix")
    assemble_training_set(SF, out, shard_hex_digits=1)
    with pytest.raises(ValueError, match="DUPLICATE"):
        assemble_training_set(SF, out, shard_hex_digits=2)
    with pytest.raises(ValueError, match="bin_tokens"):
        assemble_training_set(SF, out, bin_tokens=4096)
    # same parameters still resume cleanly (all shards skipped)
    m = assemble_training_set(SF, out)
    assert m["written"] == [] and len(m["skipped"]) > 0
