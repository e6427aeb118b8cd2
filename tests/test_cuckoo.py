"""Cuckoo filter unit tests: exactness at test scale, serialization,
test-and-set semantics."""

import numpy as np

from realestate_scraper_ray.state.cuckoo import CuckooFilter


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_contains_and_add_first_seen_wins():
    f = CuckooFilter(10_000)
    k = _keys(5_000)
    seen1 = f.contains_and_add(k)
    assert not seen1.any()          # all new
    seen2 = f.contains_and_add(k)
    assert seen2.all()              # all already present
    assert f.count == 5_000


def test_within_batch_duplicates_keep_first():
    f = CuckooFilter(1_000)
    k = np.array([1, 2, 1, 3, 2], dtype=np.uint64)
    seen = f.contains_and_add(k)
    assert seen.tolist() == [False, False, True, False, True]


def test_no_false_negatives_and_tiny_fp_rate():
    f = CuckooFilter(50_000, fp_bits=32)
    ins = _keys(40_000, seed=1)
    f.contains_and_add(ins)
    assert f.contains(ins).all()    # no false negatives
    other = _keys(40_000, seed=2)
    fp = f.contains(other).sum()
    assert fp == 0                  # 32-bit fingerprints: FP ~2e-9


def test_dump_restore_roundtrip():
    f = CuckooFilter(10_000)
    k = _keys(3_000, seed=3)
    f.contains_and_add(k)
    g = CuckooFilter.restore(f.dump())
    assert g.count == f.count
    assert g.contains(k).all()
    assert (g.table == f.table).all()
    # restored filter keeps deduping
    assert g.contains_and_add(k).all()


def test_high_load_insert():
    f = CuckooFilter(20_000, fp_bits=16)
    k = _keys(16_000, seed=4)
    f.contains_and_add(k)
    assert f.contains(k).all()


def test_sliding_cuckoo_expires_and_readmits():
    import numpy as np
    from realestate_scraper_ray.state.cuckoo import SlidingCuckoo
    rng = np.random.default_rng(3)
    keys = rng.integers(1, 2**63, 200).astype(np.uint64)
    sc = SlidingCuckoo(capacity=1 << 12, n_windows=3)
    assert not sc.contains_and_add(keys).any()        # all new
    assert sc.contains_and_add(keys).all()            # all seen (same window)
    sc.rotate(); sc.rotate()
    assert sc.contains(keys).all()                    # still within 3 windows
    sc.rotate()                                       # original window dropped
    assert not sc.contains(keys).any()                # expired → recrawlable
    assert not sc.contains_and_add(keys).any()        # re-admitted as new


def test_sliding_cuckoo_roundtrip_and_cross_window_dedup():
    import numpy as np
    from realestate_scraper_ray.state.cuckoo import SlidingCuckoo
    from realestate_scraper_ray.functions.sketches import splitmix64
    sc = SlidingCuckoo(capacity=1 << 12, n_windows=4)
    # uniform 64-bit keys (the filter fingerprints the TOP bits, as the
    # sha1-derived production keys do); b overlaps a on ids 50..100
    a = splitmix64(np.arange(1, 101, dtype=np.int64))
    b = splitmix64(np.arange(50, 151, dtype=np.int64))
    sc.contains_and_add(a)
    sc.rotate()
    seen = sc.contains_and_add(b)
    # overlap recognized across windows, remainder admitted to window 2
    assert seen.sum() == len(set(a.tolist()) & set(b.tolist()))
    blob = sc.dump()
    rc = SlidingCuckoo.restore(blob)
    assert rc.contains(a).all() and rc.contains(b).all()
    assert len(rc.windows) == len(sc.windows)
