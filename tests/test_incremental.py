"""Incremental aggregate maintenance (stages/incremental.py):
delta-folded state equals full recompute, exactly-once re-apply,
crash-between-commit-and-manifest retry, and O(delta) bucket touch."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from realestate_scraper_ray.stages.incremental import IncrementalGroupSum


def _make_partials():
    # nested so cloudpickle ships it by value (the test module is not
    # importable inside Ray workers)
    def partials(t: pa.Table) -> pa.Table:
        g = pa.table({"k": t["k"], "grp": t["grp"],
                      "n": np.ones(len(t), np.int64),
                      "s": t["v"].to_numpy().astype(np.int64)}) \
            .group_by(["k", "grp"]).aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns(["k", "grp", "n", "s"])
    return partials


_partials = _make_partials()


def _mk(rng, n, kmax=40):
    return pa.table({
        "k": rng.integers(0, kmax, n).astype(np.int64),
        "grp": rng.choice(["x", "y"], n),
        "v": rng.integers(-50, 200, n).astype(np.int64)})


def _state_dict(state):
    return {(r["k"], r["grp"]): (r["n"], r["s"])
            for r in state.read().take_all()}


def _expect(tables):
    import collections
    agg = collections.defaultdict(lambda: [0, 0])
    for t in tables:
        for k, g, v in zip(t["k"].to_pylist(), t["grp"].to_pylist(),
                           t["v"].to_pylist()):
            agg[(k, g)][0] += 1
            agg[(k, g)][1] += v
    return {k: tuple(v) for k, v in agg.items()}


def test_incremental_equals_full_recompute(ray_session, tmp_path):
    rng = np.random.default_rng(1)
    deltas = [_mk(rng, 500) for _ in range(3)]
    st = IncrementalGroupSum(str(tmp_path / "st"), ["k", "grp"], "k",
                             n_buckets=8)
    for i, d in enumerate(deltas):
        assert st.update(rd.from_arrow(d), f"d{i}", _partials)
    assert _state_dict(st) == _expect(deltas)


def test_exactly_once_reapply_is_noop(ray_session, tmp_path):
    rng = np.random.default_rng(2)
    d = _mk(rng, 300)
    st = IncrementalGroupSum(str(tmp_path / "st"), ["k", "grp"], "k")
    assert st.update(rd.from_arrow(d), "d0", _partials)
    before = _state_dict(st)
    assert not st.update(rd.from_arrow(d), "d0", _partials)
    assert _state_dict(st) == before


def test_crash_before_manifest_retry_is_safe(ray_session, tmp_path):
    """Crash window: every bucket committed but the state-level manifest
    write was lost. The retry must not double-count — the per-bucket
    applied-deltas metadata (inside the parquet file, committed by the
    same rename as the data) makes each bucket's re-fold a no-op."""
    rng = np.random.default_rng(3)
    d0, d1 = _mk(rng, 400), _mk(rng, 400)
    st = IncrementalGroupSum(str(tmp_path / "st"), ["k", "grp"], "k")
    st.update(rd.from_arrow(d0), "d0", _partials)
    st.update(rd.from_arrow(d1), "d1", _partials)
    # simulate the crash: manifest lost AFTER d1's buckets committed
    os.remove(st._manifest_path())
    assert st.applied_deltas() == []
    assert st.update(rd.from_arrow(d1), "d1", _partials)  # retried
    assert _state_dict(st) == _expect([d0, d1])  # not double-counted


def test_untouched_buckets_not_rewritten(ray_session, tmp_path):
    """O(delta): a delta whose keys hash into one bucket must leave
    every other bucket file untouched (same inode content/mtime)."""
    rng = np.random.default_rng(4)
    st = IncrementalGroupSum(str(tmp_path / "st"), ["k", "grp"], "k",
                             n_buckets=8)
    st.update(rd.from_arrow(_mk(rng, 500)), "d0", _partials)
    paths = sorted(
        os.path.join(st.state_dir, b, "part.parquet")
        for b in os.listdir(st.state_dir) if b.startswith("bucket="))
    assert len(paths) > 2
    from realestate_scraper_ray.stages.incremental import _bucket_of
    one_key = np.int64(7)
    target = int(_bucket_of(np.array([one_key]), 8)[0])
    stamps = {p: os.stat(p).st_mtime_ns for p in paths}
    narrow = pa.table({"k": np.array([one_key] * 10),
                       "grp": ["x"] * 10,
                       "v": np.arange(10, dtype=np.int64)})
    st.update(rd.from_arrow(narrow), "d1", _partials)
    for p in paths:
        if f"bucket={target:02d}" in p:
            assert os.stat(p).st_mtime_ns != stamps[p]
        else:
            assert os.stat(p).st_mtime_ns == stamps[p]
