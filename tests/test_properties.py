"""Property-based tests (hypothesis) for the scalar kernels and the
cuckoo filter — invariants that example tests can't sweep."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from realestate_scraper_ray.functions.urls import (
    canonicalize_urls, coerce_float, normalize_url,
)
from realestate_scraper_ray.state.cuckoo import CuckooFilter

url_path = st.text(
    alphabet=st.sampled_from("abcdefgh0123456789-/"), min_size=0, max_size=30)
query_tok = st.text(
    alphabet=st.sampled_from("abcz019="), min_size=1, max_size=8)


@st.composite
def urls(draw):
    host = draw(st.sampled_from(
        ["x.otodom.pl", "gratka.pl", "ogloszenia.trojmiasto.pl"]))
    path = draw(url_path).strip("/")
    q = draw(st.lists(query_tok, max_size=4))
    frag = draw(st.sampled_from(["", "#top", "#a/b?c=1"]))
    u = f"https://{host}/{path}"
    if q:
        u += "?" + "&".join(q)
    return u + frag


@given(urls())
@settings(max_examples=200, deadline=None)
def test_normalize_url_idempotent_and_matches_vectorized(u):
    once = normalize_url(u)
    assert normalize_url(once) == once                      # idempotent
    assert "#" not in once
    got = canonicalize_urls([u])[0].as_py()
    assert got == once                                      # scalar ≡ vector


@given(st.lists(urls(), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_canonicalize_batch_elementwise(batch):
    vec = [v.as_py() for v in canonicalize_urls(batch)]
    assert vec == [normalize_url(u) for u in batch]


@given(st.floats(min_value=0.01, max_value=9_999_999, allow_nan=False),
       st.sampled_from(["{:.2f}", "{:.1f}", "{:.0f}"]),
       st.sampled_from(["", " zł", " m²", " zł/m2"]),
       st.booleans())
@settings(max_examples=200, deadline=None)
def test_coerce_float_roundtrip(x, fmt, suffix, use_comma):
    s = fmt.format(x)
    expect = float(s)
    if use_comma:
        s = s.replace(".", ",")
    got = coerce_float(s + suffix)
    assert got is not None
    assert abs(got - expect) < 1e-9


@given(st.lists(st.integers(min_value=1, max_value=2**63 - 1),
                min_size=1, max_size=300, unique=True))
@settings(max_examples=50, deadline=None)
def test_cuckoo_no_false_negatives(keys):
    f = CuckooFilter(4096, 32)
    arr = np.array(keys, dtype=np.uint64)
    seen_first = f.contains_and_add(arr)
    assert not seen_first.any()              # fresh keys admitted as new
    assert f.contains(arr).all()             # no false negatives
    seen_again = f.contains_and_add(arr)
    assert seen_again.all()                  # test-and-set is idempotent
    assert f.count == len(keys)


@given(st.lists(st.integers(min_value=1, max_value=2**63 - 1),
                min_size=1, max_size=200, unique=True))
@settings(max_examples=30, deadline=None)
def test_cuckoo_dump_restore_preserves_membership(keys):
    f = CuckooFilter(2048, 32)
    arr = np.array(keys, dtype=np.uint64)
    f.contains_and_add(arr)
    g = CuckooFilter.restore(f.dump())
    assert g.contains(arr).all()
    assert g.count == f.count


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_popcount64_matches_python(vals):
    from realestate_scraper_ray.stages.dedupe import _popcount64
    arr = np.array(vals, dtype=np.uint64)
    got = _popcount64(np.ascontiguousarray(arr))
    exp = np.array([bin(int(v)).count("1") for v in vals])
    assert (got == exp).all()


@given(st.lists(st.text(alphabet="abcde ", min_size=0, max_size=60),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=50, deadline=None)
def test_shingle_hash_matrix_shapes_and_determinism(texts, k):
    from realestate_scraper_ray.functions.textstats import _hash_tokens_matrix
    a = _hash_tokens_matrix(texts, k)
    b = _hash_tokens_matrix(texts, k)
    for ha, hb, t in zip(a, b, texts):
        assert (ha == hb).all()              # deterministic
        words = t.split()
        n_expected = 0 if not words else max(1, len(words) - k + 1)
        assert len(ha) == n_expected
        # equal word sequences hash equal; the hash depends only on words
        assert (_hash_tokens_matrix([" ".join(words)], k)[0] == ha).all()


# ---------------------------------------------------------------------------
# sketch kernels
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), max_size=300))
@settings(max_examples=100, deadline=None)
def test_hll_merge_is_order_and_shard_invariant(vals):
    from realestate_scraper_ray.functions.sketches import hll_merge, hll_partial
    arr = np.array(vals, dtype=np.int64)
    whole = hll_partial(arr)
    # any 2-way split merges back to the single-pass registers
    for cut in {0, len(arr) // 3, len(arr) // 2, len(arr)}:
        merged = hll_merge([hll_partial(arr[:cut]), hll_partial(arr[cut:])])
        assert np.array_equal(merged, whole)
    # duplicates never change the sketch
    assert np.array_equal(hll_partial(np.concatenate([arr, arr])), whole)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_clz64_matches_bit_length(vals):
    from realestate_scraper_ray.functions.sketches import _clz64
    xs = np.array(vals, dtype=np.uint64)
    got = _clz64(xs)
    assert got.tolist() == [64 - int(x).bit_length() if x else 64 for x in xs]


@given(st.lists(st.sampled_from("abcdefgh"), max_size=400),
       st.integers(min_value=2, max_value=16))
@settings(max_examples=100, deadline=None)
def test_misra_gries_never_overcounts_and_bounds_undercount(stream, k):
    from collections import Counter

    from realestate_scraper_ray.functions.sketches import misra_gries_partial
    sk = misra_gries_partial(stream, k)
    true = Counter(stream)
    bound = len(stream) // k
    assert len(sk) <= k
    for t, est in sk.items():
        assert est <= true[t]
    for t, cnt in true.items():
        assert cnt - sk.get(t, 0) <= bound


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=0, max_size=400),
       st.integers(min_value=1, max_value=7))
@settings(max_examples=60, deadline=None)
def test_bloom_membership_and_split_invariance(vals, n_splits):
    """No false negatives ever; OR-merge of any split equals single-pass."""
    from realestate_scraper_ray.functions.sketches import (
        bloom_merge, bloom_partial, bloom_probe,
    )
    arr = np.array(vals, dtype=np.int64)
    single = bloom_partial(arr)
    parts = [bloom_partial(c) for c in np.array_split(arr, n_splits)]
    merged = bloom_merge(parts) if parts else single
    assert np.array_equal(single, merged)
    if len(arr):
        assert bloom_probe(merged, arr).all()


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=500),
       st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99]),
       st.integers(min_value=2, max_value=9))
@settings(max_examples=60, deadline=None)
def test_hist_quantile_one_bin_error_and_split_invariance(vals, q, n_splits):
    """Merged partials == single pass; quantile within one bin width of
    the exact PERCENTILE_DISC, for any data/split/q."""
    from realestate_scraper_ray.functions.sketches import (
        hist_partial, hist_quantile,
    )
    arr = np.array(vals, dtype=np.float64)
    lo, hi = float(arr.min()), float(arr.max())
    nbins = 512
    single = hist_partial(arr, lo, hi, nbins)
    merged = np.zeros(nbins, dtype=np.int64)
    for c in np.array_split(arr, n_splits):
        merged += hist_partial(c, lo, hi, nbins)
    assert np.array_equal(single, merged)
    v = np.sort(arr)
    exact = v[min(len(v) - 1, max(0, int(np.ceil(q * len(v))) - 1))]
    approx = hist_quantile(merged, lo, hi, q)
    binw = (hi - lo) / nbins if hi > lo else 0.0
    assert abs(approx - exact) <= binw + 1e-9 + abs(exact) * 1e-12
