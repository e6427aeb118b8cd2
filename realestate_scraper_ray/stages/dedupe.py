"""Deduplication stages over Ray Data Datasets.

Each operator is expressed Ray-Data-first (vectorized ``map_batches`` to
compute signatures, ``groupby`` on the bucket key for the shuffle,
``map_groups`` for within-bucket work), mirroring the pattern the crawl
engine uses for its URL-seen set (hash-partition + per-group first).

Operators:
  - exact:       hash-partition on content hash, keep-first (min id)
  - MinHash+LSH: shingle → minhash → band → bucket groupby → candidate
                 pairs → exact-Jaccard verification (Broder '97)
  - SimHash:     64-bit simhash → 16-bit band buckets → Hamming verify
                 (Charikar '02)
  - n-gram Jaccard: blocking by (length bucket) → exact pairwise Jaccard
  - embedding near-dup: cosine ≥ τ pairs via blocked matmul against a
                 broadcast matrix (scale path: hyperplane-LSH buckets)

Verification joins need both texts of a candidate pair; at test scale
the id→text map is broadcast via ``ray.put`` (read once per task). At
100 TB the same verify runs as a bucketed self-join (hash(text_id) %
B) — the candidate-generation shuffle keys are unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions.textstats import (
    jaccard, minhash_signatures, rolling_hash64, simhash64, word_shingle_set,
)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_first(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Keep the first (min id) row per distinct text. The Ray Data
    analogue of the reference DedupeSet's first-seen-wins (dedup.py:16-27):
    hash-partition on the content hash, per-group min."""

    def add_hash(t: pa.Table) -> pa.Table:
        # int64 view of the uint64 hash: Ray Data groupby keys round-trip
        # through Python ints, which overflow on values >= 2**63
        h = np.asarray(rolling_hash64(t[text_col].combine_chunks())).view(np.int64)
        return t.append_column("content_hash", pa.array(h))

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby("content_hash")
            .aggregate(Min(id_col, alias_name=id_col),
                       Count(alias_name="dupes")))


def dedup_group_first(ds: rd.Dataset, group_cols: list[str], id_col: str) -> rd.Dataset:
    """Keep-first (min id) per group key — hash-partition + per-group
    first over arbitrary keys."""
    return ds.groupby(group_cols).aggregate(Min(id_col, alias_name=id_col),
                                            Count(alias_name="dupes"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_lsh_pairs(ds: rd.Dataset, text_col: str, id_col: str,
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.5) -> pd.DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact Jaccard ≥ threshold).

    shingle→minhash per batch (vectorized) → explode to
    (band, band_hash, id) rows → groupby bucket → within-bucket pairs →
    dedupe pairs → exact-Jaccard verify against the broadcast text map.
    """
    rows_per_band = num_perm // bands

    def to_bands(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(t[text_col].combine_chunks(), num_perm, shingle_k)
        n = len(sig)
        band_hash = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            h = np.full(n, 1469598103934665603, dtype=np.uint64)
            for c in range(rows_per_band):
                h = (h ^ chunk[:, c]) * np.uint64(1099511628211)
            band_hash[:, b] = h
        ids = np.repeat(np.asarray(t[id_col]), bands)
        return pa.table({
            id_col: ids,
            "band": np.tile(np.arange(bands, dtype=np.int32), n),
            # int64 view: groupby keys must stay in Python-int-safe range
            "band_hash": band_hash.reshape(-1).view(np.int64),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    cand = (ds.map_batches(to_bands, batch_format="pyarrow")
            .groupby(["band", "band_hash"])
            .map_groups(bucket_pairs, batch_format="pandas")
            .groupby(["id_a", "id_b"])
            .aggregate(Count(alias_name="n_buckets"))
            .to_pandas())
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    texts = dict(zip(*[c.to_pylist() for c in _id_text_arrays(ds, id_col, text_col)]))
    texts_ref = ray.put({i: word_shingle_set(t, shingle_k) for i, t in texts.items()})
    shingles = ray.get(texts_ref)
    jac = [jaccard(shingles[a], shingles[b])
           for a, b in zip(cand["id_a"], cand["id_b"])]
    cand = cand.assign(jaccard=jac)
    out = cand[cand["jaccard"] >= threshold][["id_a", "id_b", "jaccard"]]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _id_text_arrays(ds: rd.Dataset, id_col: str, text_col: str):
    t = pa.Table.from_pylist(ds.select_columns([id_col, text_col]).take_all())
    return t[id_col], t[text_col]


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_pairs(ds: rd.Dataset, text_col: str, id_col: str,
                  max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4×16-bit band buckets (any pair within
    Hamming ≤ 3 of a 64-bit hash shares at least one exact 16-bit band —
    pigeonhole), verified by exact Hamming distance."""

    def to_bands(t: pa.Table) -> pa.Table:
        sh = simhash64(t[text_col].combine_chunks())
        n = len(sh)
        bands = np.stack([(sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
                          for b in range(4)], axis=1)
        return pa.table({
            id_col: np.repeat(np.asarray(t[id_col]), 4),
            "simhash": np.repeat(sh, 4).view(np.int64),
            "band": np.tile(np.arange(4, dtype=np.int32), n),
            "band_val": bands.reshape(-1).view(np.int64),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        a, b = np.triu_indices(len(ids), k=1)
        ham = np.array([bin(int(hs[i]) ^ int(hs[j])).count("1")
                        for i, j in zip(a, b)])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[a][keep], "id_b": ids[b][keep],
                             "hamming": ham[keep]})

    out = (ds.map_batches(to_bands, batch_format="pyarrow")
           .groupby(["band", "band_val"])
           .map_groups(bucket_pairs, batch_format="pandas")
           .groupby(["id_a", "id_b"])
           .aggregate(Min("hamming", alias_name="hamming"))
           .to_pandas())
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard with length blocking
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds: rd.Dataset, text_col: str, id_col: str,
                        shingle_k: int = 3, threshold: float = 0.5,
                        length_bucket: int = 32) -> pd.DataFrame:
    """Exact pairwise Jaccard within length-bucket blocking groups
    (a pair above `threshold` has near-equal shingle counts, so
    comparing adjacent length buckets only is a sound blocker)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.utf8_length(t[text_col])
        b = pc.cast(pc.floor(pc.divide(pc.cast(n, pa.float64()), length_bucket)),
                    pa.int32())
        out = t.select([id_col, text_col])
        # each row lands in its own and the next bucket → adjacent
        # lengths meet in at least one group
        lo = out.append_column("block", b)
        hi = out.append_column("block", pc.cast(pc.add(b, 1), pa.int32()))
        return pa.concat_tables([lo, hi])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].tolist()
        sets = [word_shingle_set(t, shingle_k) for t in g[text_col]]
        ia, ib, js = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                val = jaccard(sets[i], sets[j])
                if val >= threshold:
                    ia.append(ids[i]); ib.append(ids[j]); js.append(val)
        return pd.DataFrame({"id_a": ia, "id_b": ib, "jaccard": js})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("block")
           .map_groups(bucket_pairs, batch_format="pandas")
           .groupby(["id_a", "id_b"])
           .aggregate(Min("jaccard", alias_name="jaccard"))
           .to_pandas())
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(ds: rd.Dataset, vec_col: str, id_col: str,
                            tau: float) -> pd.DataFrame:
    """Pairs (id_a < id_b) with cosine similarity ≥ τ.

    Test-scale path: the (small) full matrix is broadcast via ``ray.put``
    once; each batch does one float64 matmul against it. Scale path:
    hyperplane-LSH bucket column + per-bucket pairs (same groupby shape
    as MinHash) — see ``similarity.lsh_buckets``.
    """
    all_rows = pa.Table.from_pylist(ds.select_columns([id_col, vec_col]).take_all())
    ids = np.asarray(all_rows[id_col])
    mat = np.array(all_rows[vec_col].to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, mat))

    def batch_pairs(t: pa.Table) -> pa.Table:
        bids = np.asarray(t[id_col])
        bm = np.array(t[vec_col].to_pylist(), dtype=np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        gids, gmat = ray.get(mat_ref)
        sims = bm @ gmat.T
        ai, bj = np.nonzero(sims >= tau)
        keep = bids[ai] < gids[bj]
        return pa.table({"id_a": bids[ai][keep], "id_b": gids[bj][keep],
                         "cos": sims[ai, bj][keep]})

    out = ds.map_batches(batch_pairs, batch_format="pyarrow").to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
