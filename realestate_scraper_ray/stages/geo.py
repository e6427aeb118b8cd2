"""Geo operators: haversine, spatial near-dup, reverse geocode, geo snap.

Reference parity (citations into /root/reference/):
  - haversine:        scrapper/adapters/morizon.py:337-346 (_haversine_m)
  - spatial near-dup: scrapper/core/backend.py:58-93 — the backend
    duplicate check (radius 50 m around (lat,lon), price ±100, footage
    ±1.0) re-expressed within the engine as a grid-bucket
    ``groupby().map_groups`` pairwise filter (SURVEY.md §2.4 J2)
  - reverse geocode:  scrapper/adapters/trojmiasto.py:343-354 — offline
    nearest-city lookup; the k-d-tree-on-import becomes a stateful
    actor-pool ``map_batches`` class (SURVEY.md §2.3 ST5)
  - geo snap:         scrapper/adapters/morizon.py:472-487
    (_snap_geo_if_far, >800 m ⇒ replace with geocoder point), with the
    geocode cache (morizon.py:406-425, ST4) as a broadcast ``ray.put``
    dict instead of a shuffle join (SURVEY.md §2.4 J4/J5)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

EARTH_R_M = 6_371_000.0


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance in meters (morizon.py:337-346)."""
    lat1, lon1 = np.radians(lat1), np.radians(lon1)
    lat2, lon2 = np.radians(lat2), np.radians(lon2)
    dlat, dlon = lat2 - lat1, lon2 - lon1
    a = (np.sin(dlat / 2.0) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2)
    return 2.0 * EARTH_R_M * np.arcsin(np.sqrt(a))


# -- spatial near-dup (J2) ---------------------------------------------------

# Grid cell ~0.002° ≈ 220 m (lat) — comfortably larger than the 50 m
# radius, so a matching pair is at most one cell apart on each axis.
CELL_DEG = 0.002


def spatial_neardup_pairs(ds: rd.Dataset, radius_m: float = 50.0,
                          price_tol: float = 100.0, area_tol: float = 1.0,
                          id_col: str = "offer_id") -> rd.Dataset:
    """All offer pairs within ``radius_m`` with price within
    ``price_tol`` and area within ``area_tol`` — the reference's dup
    predicate (backend.py:72-80) as a distributed self-join.

    Scale shape: each offer is replicated into its home grid cell and
    the 8 neighbors; a qualifying pair (cells at most 1 apart on each
    axis) co-occurs in both members' home cells and is emitted only in
    the lexicographically-smaller home cell, so the shuffle key is the
    grid cell, groups are city-block-sized, and no pair is produced
    twice. O(rows·9) shuffle volume, pairwise work only within ~220 m
    cells — never a global cross join."""

    def replicate(t: pa.Table) -> pd.DataFrame:
        df = t.select([id_col, "price_amount", "area_m2",
                       "lat", "lon"]).to_pandas()
        hx = np.floor(df["lat"].to_numpy() / CELL_DEG).astype(np.int64)
        hy = np.floor(df["lon"].to_numpy() / CELL_DEG).astype(np.int64)
        df["hx"], df["hy"] = hx, hy
        out = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                rep = df.copy()
                rep["cell_x"] = hx + dx
                rep["cell_y"] = hy + dy
                rep["home"] = (dx == 0) & (dy == 0)
                out.append(rep)
        return pd.concat(out, ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=g[id_col].dtype),
                              "id_b": pd.Series([], dtype=g[id_col].dtype),
                              "dist_m": pd.Series([], dtype="float64")})
        if n < 2:
            return empty
        lat, lon = g["lat"].to_numpy(), g["lon"].to_numpy()
        price, area = g["price_amount"].to_numpy(), g["area_m2"].to_numpy()
        home = g["home"].to_numpy()
        hx, hy = g["hx"].to_numpy(), g["hy"].to_numpy()
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(n, k=1)
        ok = (np.abs(price[ia] - price[ib]) <= price_tol) \
            & (np.abs(area[ia] - area[ib]) <= area_tol) \
            & (ids[ia] != ids[ib])

        # canonical emission: this group is cell c; emit (x, y) iff x is
        # home here (c == home(x)) and home(y) is lexicographically
        # after home(x) — or equal with id(x) < id(y). Exactly one cell
        # satisfies this per pair.
        def canon(x, y):
            gt = (hx[y] > hx[x]) | ((hx[y] == hx[x]) & (hy[y] > hy[x]))
            eq = (hx[y] == hx[x]) & (hy[y] == hy[x])
            return home[x] & (gt | (eq & (ids[x] < ids[y])))

        ok &= canon(ia, ib) | canon(ib, ia)
        ia, ib = ia[ok], ib[ok]
        if ia.size == 0:
            return empty
        d = haversine_m(lat[ia], lon[ia], lat[ib], lon[ib])
        keep = d <= radius_m
        ia, ib, d = ia[keep], ib[keep], d[keep]
        a, b = ids[ia], ids[ib]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        res = pd.DataFrame({"id_a": lo, "id_b": hi, "dist_m": np.round(d, 2)})
        return res.drop_duplicates(["id_a", "id_b"])

    rep = ds.map_batches(replicate, batch_format="pyarrow")
    return rep.groupby(["cell_x", "cell_y"]).map_groups(pairs)


# -- reverse geocode (ST5/J7) ------------------------------------------------

# Deterministic offline gazetteer: approximate centroids of the 16
# voivodeship capitals (public geography; the reference loads the
# reverse_geocoder k-d tree instead, trojmiasto.py:7).
CITY_CENTROIDS: dict[str, tuple[float, float]] = {
    "Wroclaw": (51.1079, 17.0385), "Bydgoszcz": (53.1235, 18.0084),
    "Lublin": (51.2465, 22.5684), "Gorzow": (52.7368, 15.2288),
    "Lodz": (51.7592, 19.4560), "Krakow": (50.0647, 19.9450),
    "Warszawa": (52.2297, 21.0122), "Opole": (50.6751, 17.9213),
    "Rzeszow": (50.0412, 21.9991), "Bialystok": (53.1325, 23.1688),
    "Gdansk": (54.3520, 18.6466), "Katowice": (50.2649, 19.0238),
    "Kielce": (50.8661, 20.6286), "Olsztyn": (53.7784, 20.4801),
    "Poznan": (52.4064, 16.9252), "Szczecin": (53.4285, 14.5528),
}


class ReverseGeocoder:
    """Actor-pool stage: nearest gazetteer city per row. The index is
    built once per actor in ``__init__`` (the Ray translation of the
    reference's module-import k-d tree load); ``__call__`` is a
    vectorized argmin over the centroid matrix."""

    def __init__(self, centroids: dict[str, tuple[float, float]] | None = None):
        cents = centroids or CITY_CENTROIDS
        self.names = np.array(list(cents.keys()))
        pts = np.array(list(cents.values()), dtype=np.float64)
        self.lat = pts[:, 0]
        self.lon = pts[:, 1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch["lat"], dtype=np.float64)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        d = haversine_m(lat[:, None], lon[:, None],
                        self.lat[None, :], self.lon[None, :])
        idx = np.argmin(d, axis=1)
        return batch.append_column(
            "city_pred", pa.array(self.names[idx])).append_column(
            "city_dist_m", pa.array(np.round(d[np.arange(len(idx)), idx], 1)))


def reverse_geocode(ds: rd.Dataset, concurrency: int = 2,
                    batch_size: int = 4096) -> rd.Dataset:
    return ds.map_batches(ReverseGeocoder, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow")


# -- geo snap (J4/J5) --------------------------------------------------------


def snap_geo(ds: rd.Dataset, geocode_cache: dict[str, tuple[float, float]],
             max_dist_m: float = 800.0) -> rd.Dataset:
    """If the geocoder knows the row's city and its point is more than
    ``max_dist_m`` from the parsed point, replace the coordinates
    (morizon.py:472-487). The cache is broadcast once via ``ray.put``
    and read inside every task — a broadcast join, not a shuffle."""
    cache_ref = ray.put(geocode_cache)

    def snap(t: pa.Table) -> pa.Table:
        cache = ray.get(cache_ref)
        cities = t["city"].to_pylist()
        lat = np.asarray(t["lat"], dtype=np.float64)
        lon = np.asarray(t["lon"], dtype=np.float64)
        pts = np.array([cache.get(c, (np.nan, np.nan)) for c in cities])
        d = haversine_m(lat, lon, pts[:, 0], pts[:, 1])
        far = ~np.isnan(d) & (d > max_dist_m)
        lat = np.where(far, pts[:, 0], lat)
        lon = np.where(far, pts[:, 1], lon)
        t = t.drop_columns(["lat", "lon"])
        return (t.append_column("lat", pa.array(lat))
                 .append_column("lon", pa.array(lon))
                 .append_column("geo_snapped", pa.array(far)))

    return ds.map_batches(snap, batch_format="pyarrow")
