"""Mergeable cardinality sketches (HyperLogLog, Flajolet et al. '07).

The reference has no approximate aggregates (SURVEY.md §2.5 "Absent"),
but a 100-TB engine needs distinct counts that don't shuffle every key:
an HLL register array is a fixed 2^P bytes regardless of input size, so
per-batch partials reduce a billion-row groupby to one tiny max-merge —
the combiner pattern the rest of the catalog uses for sums, applied to
COUNT(DISTINCT).

All hashing is splitmix64 (same mix as the MinHash kernels) — fully
deterministic across processes, so sketch results are reproducible.
"""

from __future__ import annotations

import numpy as np

HLL_P = 12  # 4096 registers, ~1.6 % standard error
HLL_M = 1 << HLL_P


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of an integer array (uint64 out)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x may contain 0 →
    returns 64). Binary-search shift ladder, 6 vector ops."""
    x = x.copy()
    n = np.zeros(len(x), dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        zero_top = (x >> np.uint64(64 - s)) == 0
        n[zero_top] += s
        x[zero_top] <<= np.uint64(s)
    n[x == 0] = 64
    return n


def hll_partial(values: np.ndarray, registers: np.ndarray | None = None
                ) -> np.ndarray:
    """Fold integer values into a 2^P uint8 register array (in place if
    ``registers`` is given) — the per-batch combiner."""
    if registers is None:
        registers = np.zeros(HLL_M, dtype=np.uint8)
    if len(values) == 0:
        return registers
    h = splitmix64(np.asarray(values))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rem = h << np.uint64(HLL_P)  # remaining 64-P significant bits, top-aligned
    rho = np.minimum(_clz64(rem), 64 - HLL_P).astype(np.uint8) + 1
    np.maximum.at(registers, idx, rho)
    return registers


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Elementwise max of register arrays — the associative merge that
    makes the sketch distributable."""
    out = np.zeros(HLL_M, dtype=np.uint8)
    for p in parts:
        np.maximum(out, p, out=out)
    return out


def hll_estimate(registers: np.ndarray) -> int:
    """Bias-corrected HLL estimate with the small-range (linear
    counting) correction from the original paper."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -registers.astype(np.float64)).sum()
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return int(round(est))


BLOOM_M_BITS = 1 << 20  # 128 KiB per partial
BLOOM_K = 7


def bloom_partial(values: np.ndarray, *, m_bits: int = BLOOM_M_BITS,
                  k: int = BLOOM_K,
                  words: np.ndarray | None = None) -> np.ndarray:
    """Fold integer keys into a Bloom bit array (uint64 words) — the
    per-batch combiner of a build-side membership sketch. Double
    hashing (Kirsch & Mitzenmacher '06): position_i = h1 + i*h2, so two
    splitmix64 passes cover all k probes. No false negatives; FP rate
    ~(1-e^{-kn/m})^k (≈0.8 % at n = m/10 bits, k=7)."""
    if words is None:
        words = np.zeros(m_bits >> 6, dtype=np.uint64)
    if len(values) == 0:
        return words
    v = np.asarray(values)
    h1 = splitmix64(v)
    h2 = splitmix64(h1) | np.uint64(1)  # odd → full-period stride
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Bitwise OR of partial bit arrays — associative, so partials can
    merge in any tree shape."""
    out = np.zeros_like(parts[0])
    for p in parts:
        np.bitwise_or(out, p, out=out)
    return out


def bloom_probe(words: np.ndarray, values: np.ndarray, *,
                k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership probe: True where all k bits are set
    (superset of the true key set — callers must exact-verify hits)."""
    m_bits = len(words) << 6
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    v = np.asarray(values)
    h1 = splitmix64(v)
    h2 = splitmix64(h1) | np.uint64(1)
    hit = np.ones(len(v), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        hit &= bit.astype(bool)
    return hit


def hist_partial(values: np.ndarray, lo: float, hi: float,
                 nbins: int = 8192,
                 counts: np.ndarray | None = None) -> np.ndarray:
    """Fold values into a fixed-width histogram over [lo, hi] — the
    per-batch combiner of a mergeable quantile sketch (fixed 8 KiB of
    int64 counts per group regardless of input size). Values are
    clipped to the range (callers pass the measured global min/max, so
    clipping never fires in practice)."""
    if counts is None:
        counts = np.zeros(nbins, dtype=np.int64)
    if len(values) == 0:
        return counts
    width = (hi - lo) or 1.0
    idx = np.clip(((np.asarray(values, dtype=np.float64) - lo)
                   / width * nbins).astype(np.int64), 0, nbins - 1)
    np.add.at(counts, idx, 1)
    return counts


def hist_quantile(counts: np.ndarray, lo: float, hi: float,
                  q: float) -> float:
    """PERCENTILE_DISC analogue over the merged histogram: right edge
    of the bin holding the ceil(q*n)-th value. Error vs the exact
    quantile is bounded by one bin width, (hi-lo)/nbins."""
    n = int(counts.sum())
    if n == 0:
        return lo
    rank = max(1, int(np.ceil(q * n)))
    b = int(np.searchsorted(np.cumsum(counts), rank))
    width = (hi - lo) / len(counts)
    return lo + (b + 1) * width


def misra_gries_partial(tokens: list[str], k: int = 256) -> dict[str, int]:
    """Misra-Gries heavy-hitter summary of one batch: at most ``k``
    counters, every true count undercounted by at most n/k (Misra &
    Gries '82). The per-batch combiner for distributed top-terms: a
    billion-token batch reduces to k counters before any shuffle."""
    counters: dict[str, int] = {}
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < k:
            counters[t] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def misra_gries_error_bound(n_tokens: int, k: int) -> int:
    """Max undercount after summing partial sketches: each partial of
    n_i tokens undercounts by <= n_i/k, and summation preserves the
    per-partial bounds, so the merged estimate undercounts by at most
    sum(n_i)/k = n/k."""
    return n_tokens // k


def grouped_percentile_disc(ds, group_col: str, value_col: str,
                            qs: dict[str, float], nbins: int = 8192,
                            driver_cap_bytes: int = 64 << 20,
                            bounds: tuple[float, float] | None = None):
    """EXACT grouped PERCENTILE_DISC without ever sorting a whole group
    in one task — the scale-safe replacement for the classic
    ``groupby(low_cardinality_key).map_groups(sort)`` pattern, where one
    pandas task ends up holding 1/n_groups of the table.

    Two streaming passes over the Dataset:

    1. per-(batch, group) fixed-width histogram partials (``nbins``
       int64 counts, constant size regardless of input), sum-merged per
       group by one sketch-only shuffle. The driver receives exactly
       ``n_groups`` sketches and turns each target rank
       ``k = ceil(q·n)`` into (bin, within-bin rank) — bounded by
       ``driver_cap_bytes`` (n_groups × nbins × 8 ≤ cap, the same
       measured-cap rule the adaptive joins use).
    2. a vectorized filter keeps only rows that fall in a targeted bin
       of their group (expected group_n/nbins rows per target) and a
       tiny ``map_groups`` picks the within-bin order statistic exactly.

    Equal values always share a bin, so the k-th smallest of the group
    is the j-th smallest of its bin with j = k − count(bins below) —
    exact, not approximate; the histogram only LOCATES the value. Skew
    caveat: a bin holding one massively repeated value stays large, but
    then every candidate in it is that same value and the in-bin sort is
    of the distinct remainder.

    Returns a pandas DataFrame with ``group_col`` plus one column per
    key of ``qs``.
    """
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd  # noqa: F401  (ds is a ray.data.Dataset)
    from ray.data.aggregate import Max, Min

    if bounds is None:
        mm = ds.aggregate(Min(value_col), Max(value_col))
        bounds = (float(mm[f"min({value_col})"]),
                  float(mm[f"max({value_col})"]))
    lo, hi = bounds  # callers that already hold min/max skip a pass
    width = (hi - lo) or 1.0

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        groups, blobs = [], []
        val = t[value_col].combine_chunks()
        grp = t[group_col].combine_chunks()
        for gv in pc.unique(grp).to_pylist():
            vals = val.filter(pc.equal(grp, gv)).to_numpy()
            groups.append(gv)
            blobs.append(hist_partial(vals, lo, hi, nbins).tobytes())
        return pa.table({group_col: pa.array(groups),
                         "counts": pa.array(blobs, pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        total = np.zeros(nbins, dtype=np.int64)
        for b in g["counts"]:
            total += np.frombuffer(b.as_py(), dtype=np.int64)
        return pa.table({group_col: g[group_col][:1],
                         "counts": pa.array([total.tobytes()], pa.binary())})

    # materialize the sketch table in the OBJECT STORE first and gate on
    # its metadata row count — the cap must fire BEFORE the driver pulls
    # n_groups x nbins x 8 bytes, not after (take_all-then-check would
    # absorb the memory the cap exists to bound)
    merged_ds = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby(group_col).map_groups(merge, batch_format="pyarrow")
                 .materialize())
    n_groups = merged_ds.count()  # metadata read on a materialized ds
    if n_groups * nbins * 8 > driver_cap_bytes:
        raise ValueError(
            f"{n_groups} groups x {nbins} bins exceeds the driver "
            f"sketch cap; raise driver_cap_bytes or lower nbins")
    merged = merged_ds.take_all()

    # targets[group][bin] = [(q_name, within_bin_rank), ...]
    targets: dict = {}
    for row in merged:
        counts = np.frombuffer(row["counts"], dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        per_bin: dict[int, list[tuple[str, int]]] = {}
        for name, q in qs.items():
            k = min(n, max(1, int(np.ceil(q * n))))
            b = int(np.searchsorted(cum, k))
            j = k - (int(cum[b - 1]) if b > 0 else 0)
            per_bin.setdefault(b, []).append((name, j))
        targets[row[group_col]] = per_bin

    def keep_targeted(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False)
        bins = np.clip(((vals - lo) / width * nbins).astype(np.int64),
                       0, nbins - 1)
        gvals = t[group_col].to_pylist()
        mask = np.fromiter(
            (g in targets and int(b) in targets[g]
             for g, b in zip(gvals, bins)), dtype=bool, count=len(gvals))
        out = t.filter(pa.array(mask))
        return out.append_column("_bin", pa.array(bins[mask]))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        key = g[group_col].iloc[0]
        got: dict[str, float] = {}
        for b, wants in targets[key].items():
            inbin = np.sort(g.loc[g["_bin"] == b, value_col].to_numpy())
            for name, j in wants:
                got[name] = float(inbin[j - 1])
        # fixed column order across groups (block schemas must agree)
        row = {group_col: [key]}
        row.update({name: [got[name]] for name in qs})
        return pd.DataFrame(row)

    out = (ds.map_batches(keep_targeted, batch_format="pyarrow")
           .groupby(group_col).map_groups(pick, batch_format="pandas")
           .to_pandas())
    return out[[group_col] + list(qs)].sort_values(group_col
                                                   ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan '05) — point-frequency
# estimation for ARBITRARY keys with a one-sided error: never an
# undercount, overcount ≤ O(N/w) w.h.p.  Complements Misra-Gries, whose
# guarantee only covers keys above n/k.  The partial is a fixed d×w
# int64 grid per batch — sum-mergeable in any tree shape.
# ---------------------------------------------------------------------------

CMS_W = 1 << 14   # 16384 columns
CMS_D = 4
_CMS_SEEDS = np.array([0x243F6A8885A308D3, 0x13198A2E03707344,
                       0xA4093822299F31D0, 0x082EFA98EC4E6C89],
                      dtype=np.uint64)


def cms_partial(hashes: np.ndarray, *, w: int = CMS_W, d: int = CMS_D,
                grid: np.ndarray | None = None) -> np.ndarray:
    """Fold pre-hashed uint64 keys into a (d, w) count grid — the
    per-batch combiner.  Row i uses splitmix64(h ^ seed_i), so the d
    probes are pairwise-independent enough for the CM analysis."""
    if grid is None:
        grid = np.zeros((d, w), dtype=np.int64)
    if len(hashes) == 0:
        return grid
    h = np.asarray(hashes, dtype=np.uint64)
    for i in range(d):
        pos = (splitmix64(h ^ _CMS_SEEDS[i]) % np.uint64(w)).astype(np.int64)
        np.add.at(grid[i], pos, 1)
    return grid


def cms_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Elementwise sum — the associative merge."""
    out = np.zeros_like(parts[0])
    for p in parts:
        out += p
    return out


def cms_query(grid: np.ndarray, hashes: np.ndarray,
              *, w: int = CMS_W) -> np.ndarray:
    """Point-frequency estimates: min over the d rows (never below the
    true count; overcount of row i is the colliding mass in its cell)."""
    h = np.asarray(hashes, dtype=np.uint64)
    d = grid.shape[0]
    ests = np.empty((d, len(h)), dtype=np.int64)
    for i in range(d):
        pos = (splitmix64(h ^ _CMS_SEEDS[i]) % np.uint64(w)).astype(np.int64)
        ests[i] = grid[i][pos]
    return ests.min(axis=0)
