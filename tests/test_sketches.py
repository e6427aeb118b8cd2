"""HyperLogLog sketch kernels: clz correctness, merge associativity,
estimate accuracy within the documented error bound."""

import numpy as np

from realestate_scraper_ray.functions.sketches import (
    HLL_M, _clz64, hll_estimate, hll_merge, hll_partial, splitmix64,
)


def test_clz64_exact():
    rng = np.random.default_rng(3)
    xs = np.concatenate([
        np.array([0, 1, 2, 3, (1 << 63), (1 << 63) - 1,
                  np.iinfo(np.uint64).max], dtype=np.uint64),
        np.uint64(1) << rng.integers(0, 64, 50).astype(np.uint64),
        rng.integers(1, 1 << 62, 200).astype(np.uint64),
    ])
    got = _clz64(xs)
    want = [64 - int(x).bit_length() if x else 64 for x in xs]
    assert got.tolist() == want


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1 << 40, 30_000)
    whole = hll_partial(vals)
    parts = [hll_partial(c) for c in np.array_split(vals, 7)]
    assert np.array_equal(hll_merge(parts), whole)


def test_hll_accuracy_small_and_large():
    for n in (10, 500, 20_000, 200_000):
        vals = np.arange(n, dtype=np.int64) * 2654435761  # distinct
        est = hll_estimate(hll_partial(vals))
        assert abs(est - n) <= max(2, 0.05 * n), (n, est)


def test_hll_duplicates_dont_inflate():
    vals = np.tile(np.arange(100, dtype=np.int64), 1000)  # 100 distinct
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 100) <= 5


def test_splitmix_deterministic():
    a = splitmix64(np.array([1, 2, 3], dtype=np.int64))
    b = splitmix64(np.array([1, 2, 3], dtype=np.int64))
    assert np.array_equal(a, b)
    assert len(set(a.tolist())) == 3


def test_registers_shape():
    assert hll_partial(np.array([], dtype=np.int64)).shape == (HLL_M,)


def test_misra_gries_guarantee_and_merge():
    from realestate_scraper_ray.functions.sketches import (
        misra_gries_error_bound, misra_gries_partial,
    )
    rng = np.random.default_rng(13)
    # zipf-ish stream: few heavy terms + long tail
    stream = (["hot1"] * 500 + ["hot2"] * 300 + ["hot3"] * 200
              + [f"tail{i}" for i in rng.integers(0, 2000, 1000)])
    rng.shuffle(stream)
    k = 64
    n = len(stream)
    bound = misra_gries_error_bound(n, k)
    # summed partials (the distributed shape)
    merged: dict[str, int] = {}
    for part in np.array_split(np.array(stream), 5):
        for t, c in misra_gries_partial(list(part), k).items():
            merged[t] = merged.get(t, 0) + c
    from collections import Counter
    true = Counter(stream)
    for term, cnt in true.items():
        est = merged.get(term, 0)
        assert est <= cnt                       # never overcounts
        if cnt > bound:
            assert term in merged               # heavy hitters survive
            assert cnt - est <= bound           # undercount bound


def test_bloom_no_false_negatives_and_fp_bound():
    from realestate_scraper_ray.functions.sketches import (
        bloom_merge, bloom_partial, bloom_probe,
    )
    rng = np.random.default_rng(7)
    members = rng.choice(10**9, size=20_000, replace=False).astype(np.int64)
    # distributed shape: partials over splits, OR-merged in a tree
    parts = [bloom_partial(chunk) for chunk in np.array_split(members, 7)]
    words = bloom_merge([bloom_merge(parts[:3]), bloom_merge(parts[3:])])
    # no false negatives, ever
    assert bloom_probe(words, members).all()
    # FP rate at n=20k, m=2^20, k=7: (1-e^{-kn/m})^k ~= 2.4e-7 — allow slack
    probes = rng.choice(10**9, size=50_000).astype(np.int64)
    probes = np.setdiff1d(probes, members)
    fp = bloom_probe(words, probes).mean()
    assert fp < 0.001, fp


def test_bloom_merge_equals_single_pass():
    from realestate_scraper_ray.functions.sketches import (
        bloom_merge, bloom_partial,
    )
    vals = np.arange(5_000, dtype=np.int64) * 31 + 7
    single = bloom_partial(vals)
    merged = bloom_merge([bloom_partial(c) for c in np.array_split(vals, 11)])
    assert np.array_equal(single, merged)


def test_hist_quantile_within_one_bin():
    from realestate_scraper_ray.functions.sketches import (
        hist_partial, hist_quantile,
    )
    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(100, 20, 30_000),
                           rng.exponential(50, 10_000)])
    lo, hi = float(vals.min()), float(vals.max())
    nbins = 8192
    counts = np.zeros(nbins, dtype=np.int64)
    for chunk in np.array_split(vals, 9):  # mergeable partials
        counts += hist_partial(chunk, lo, hi, nbins)
    assert counts.sum() == len(vals)
    binw = (hi - lo) / nbins
    v = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.9, 0.95, 0.999):
        exact = v[min(len(v) - 1, max(0, int(np.ceil(q * len(v))) - 1))]
        approx = hist_quantile(counts, lo, hi, q)
        assert abs(approx - exact) <= binw + 1e-9, (q, approx, exact)


def test_hist_empty_and_constant():
    from realestate_scraper_ray.functions.sketches import (
        hist_partial, hist_quantile,
    )
    empty = hist_partial(np.array([]), 0.0, 1.0, 16)
    assert hist_quantile(empty, 0.0, 1.0, 0.5) == 0.0
    const = hist_partial(np.full(100, 5.0), 5.0, 5.0, 16)
    assert const.sum() == 100  # degenerate range doesn't crash


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def test_cms_never_undercounts_and_bounds_overcount():
    import collections

    import numpy as np

    from realestate_scraper_ray.functions.sketches import (
        cms_merge, cms_partial, cms_query,
    )
    rng = np.random.default_rng(9)
    # zipf-ish skew: heavy keys + a long tail
    keys = np.concatenate([
        rng.integers(0, 50, 20000), rng.integers(0, 100000, 30000),
    ]).astype(np.uint64)
    grid = cms_merge([cms_partial(c) for c in np.array_split(keys, 7)])
    true = collections.Counter(keys.tolist())
    q = np.array(sorted(true), dtype=np.uint64)
    est = cms_query(grid, q)
    tv = np.array([true[int(k)] for k in q])
    assert (est >= tv).all()                      # one-sided, always
    w = grid.shape[1]
    assert (est - tv).max() <= 20 * len(keys) // w


def test_cms_merge_equals_single_pass():
    import numpy as np

    from realestate_scraper_ray.functions.sketches import (
        cms_merge, cms_partial,
    )
    rng = np.random.default_rng(10)
    keys = rng.integers(0, 1000, 9000).astype(np.uint64)
    whole = cms_partial(keys)
    merged = cms_merge([cms_partial(c) for c in np.array_split(keys, 5)])
    assert (whole == merged).all()
