"""Pure-numpy k-d tree for exact nearest-neighbor reverse geocoding.

The reference's reverse geocoder is a k-d-tree library over a ~150k
row gazetteer loaded once at import (trojmiasto.py:7,343-354); the
Ray translation builds the index once per actor (``ReverseGeocoder``,
stages/geo.py). A brute-force argmin is honest for the synthetic
gazetteer (~dozens of cities) but O(batch × gazetteer) at reference
scale — this module is the real index that keeps the per-actor build
(one O(n log n) construction) and answers batched queries in
O(log n) node visits each.

Geometry: (lat, lon) maps to 3-D unit-sphere Cartesian points;
Euclidean (chord) distance is strictly monotone in great-circle
distance, so the chord NN *is* the haversine NN — no metric
distortion at the poles or the date line (the flaw of a raw
lat/lon-degree tree).

Implementation: arrays, not nodes. The build permutes the point set
in place (median split on the widest dimension per node, an implicit
balanced binary tree over index ranges); the batched query walks the
tree with an explicit stack of (node, query-subset) pairs, descending
the near side first and pushing the far side only for queries whose
current best chord still reaches across the splitting plane —
standard branch-and-bound, vectorized over the query subset at every
node."""

from __future__ import annotations

import numpy as np


def sphere_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray) -> np.ndarray:
    """(n,) lat/lon degrees → (n, 3) unit-sphere Cartesian points."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)],
                    axis=1)


def chord_to_haversine_m(chord: np.ndarray,
                         radius_m: float = 6_371_000.0) -> np.ndarray:
    """Chord length on the unit sphere → great-circle metres."""
    return 2.0 * radius_m * np.arcsin(np.clip(chord / 2.0, 0.0, 1.0))


class KDTree:
    """Balanced 3-D k-d tree with batched exact-NN queries.

    ``leaf_size`` trades stack depth for brute-force width at the
    leaves; 16 measured well (leaves fit a cache line of points and
    the tree stays ~log2(n/16) deep)."""

    def __init__(self, pts: np.ndarray, leaf_size: int = 16):
        pts = np.ascontiguousarray(pts, dtype=np.float64)
        n = len(pts)
        self.leaf_size = int(leaf_size)
        self.perm = np.arange(n, dtype=np.int64)
        # implicit tree: node i has children 2i+1 / 2i+2; per node the
        # (start, end) range into perm, split dim and split value
        max_nodes = 4 * max(1, n // max(1, leaf_size)) + 64
        self.start = np.zeros(max_nodes, np.int64)
        self.end = np.zeros(max_nodes, np.int64)
        self.dim = np.full(max_nodes, -1, np.int64)  # -1 = leaf/unused
        self.val = np.zeros(max_nodes, np.float64)
        self._pts_orig = pts
        self._build(0, 0, n)
        self.pts = pts[self.perm]  # tree order, cache-friendly leaves

    def _build(self, node: int, s: int, e: int) -> None:
        while node >= len(self.dim):  # degenerate splits outgrew estimate
            grow = len(self.dim)
            for name in ("start", "end", "dim", "val"):
                arr = getattr(self, name)
                setattr(self, name, np.concatenate(
                    [arr, np.full(grow, -1 if name == "dim" else 0,
                                  arr.dtype)]))
        self.start[node], self.end[node] = s, e
        if e - s <= self.leaf_size:
            return
        seg = self.perm[s:e]
        sub = self._pts_orig[seg]
        d = int(np.argmax(sub.max(axis=0) - sub.min(axis=0)))
        order = np.argsort(sub[:, d], kind="stable")
        self.perm[s:e] = seg[order]
        mid = (e - s) // 2
        self.dim[node] = d
        self.val[node] = self._pts_orig[self.perm[s + mid], d]
        self._build(2 * node + 1, s, s + mid)
        self._build(2 * node + 2, s + mid, e)

    def query(self, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Exact nearest neighbor for each row of ``q`` (m, 3).
        Returns (indices into the ORIGINAL point array, chord
        distances)."""
        q = np.ascontiguousarray(q, dtype=np.float64)
        m = len(q)
        best_d2 = np.full(m, np.inf)
        best_i = np.full(m, -1, np.int64)
        if len(self.pts) == 0 or m == 0:
            return best_i, np.sqrt(best_d2)
        stack: list[tuple[int, np.ndarray]] = [(0, np.arange(m))]
        while stack:
            node, qi = stack.pop()
            d = self.dim[node]
            if d < 0:  # leaf: brute force its point range
                s, e = self.start[node], self.end[node]
                diff = self.pts[s:e][None, :, :] - q[qi][:, None, :]
                d2 = np.einsum("ijk,ijk->ij", diff, diff)
                j = np.argmin(d2, axis=1)
                dmin = d2[np.arange(len(qi)), j]
                upd = dmin < best_d2[qi]
                ui = qi[upd]
                best_d2[ui] = dmin[upd]
                best_i[ui] = s + j[upd]
                continue
            delta = q[qi, d] - self.val[node]
            near_left = delta < 0
            # push the FAR side first (processed after the near side
            # tightens best_d2); prune at push time with the current
            # bound — the pop re-checks nothing, the mask did it
            for side, mask in ((2 * node + 2, near_left),
                               (2 * node + 1, ~near_left)):
                far_q = qi[mask & (delta * delta < best_d2[qi])]
                if far_q.size:
                    stack.append((side, far_q))
            for side, mask in ((2 * node + 1, near_left),
                               (2 * node + 2, ~near_left)):
                nq = qi[mask]
                if nq.size:
                    stack.append((side, nq))
        return self.perm[best_i], np.sqrt(best_d2)


class SphereNN:
    """Exact nearest-gazetteer-entry index over (lat, lon) rows: the
    k-d tree above on unit-sphere points, distances reported in
    great-circle metres."""

    def __init__(self, lat_deg: np.ndarray, lon_deg: np.ndarray,
                 leaf_size: int = 16):
        self.tree = KDTree(sphere_xyz(lat_deg, lon_deg),
                           leaf_size=leaf_size)

    def query(self, lat_deg: np.ndarray,
              lon_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx, chord = self.tree.query(sphere_xyz(lat_deg, lon_deg))
        return idx, chord_to_haversine_m(chord)
