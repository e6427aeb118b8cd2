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
    reference's module-import k-d tree load, trojmiasto.py:7,343-354).
    Small gazetteers take a vectorized haversine argmin; past
    ``kdtree_min`` entries a real k-d tree over unit-sphere points
    answers each batch in O(log n) node visits per query — the
    reference's 150k-row gazetteer is the sizing case (brute force is
    O(batch × gazetteer) there). Chord NN on the sphere equals
    haversine NN (monotone metrics), so both paths return the same
    city; tests assert equality on a 5k-entry gazetteer."""

    def __init__(self, centroids: dict[str, tuple[float, float]] | None = None,
                 kdtree_min: int = 256):
        cents = centroids or CITY_CENTROIDS
        self.names = np.array(list(cents.keys()))
        pts = np.array(list(cents.values()), dtype=np.float64)
        self.lat = pts[:, 0]
        self.lon = pts[:, 1]
        self.nn = None
        if len(self.names) >= kdtree_min:
            from ..functions.kdtree import SphereNN
            self.nn = SphereNN(self.lat, self.lon)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch["lat"], dtype=np.float64)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        if self.nn is not None:
            idx, dist = self.nn.query(lat, lon)
        else:
            d = haversine_m(lat[:, None], lon[:, None],
                            self.lat[None, :], self.lon[None, :])
            idx = np.argmin(d, axis=1)
            dist = d[np.arange(len(idx)), idx]
        return batch.append_column(
            "city_pred", pa.array(self.names[idx])).append_column(
            "city_dist_m", pa.array(np.round(dist, 1)))


def reverse_geocode(ds: rd.Dataset, concurrency: int = 2,
                    batch_size: int = 4096) -> rd.Dataset:
    return ds.map_batches(ReverseGeocoder, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow")


# -- geocoder service: miss path + fallback chain + persisted cache ----------
# Reference ST4/J4: OSM geocode cache (query → (lat,lon) JSON, read +
# write-back per miss, morizon.py:406-425) and the fallback-query chain
# with per-level queries (street→district→city, gratka.py:326-426).
# Here: a deterministic synthetic geocoder behind a cache actor that
# loads its JSON cache at construction, answers batched lookups
# (computing + caching misses), and flushes atomically.


def _geo_h64(seed: int, *key: object) -> int:
    import hashlib
    b = hashlib.sha1(("%d|" % seed + "|".join(map(str, key))).encode()).digest()
    return int.from_bytes(b[:8], "big")


def synthetic_geocode(query: str, seed: int = 11,
                      unknown_per_mille: int = 250,
                      wrong_per_mille: int = 120,
                      ) -> tuple[float, float, str] | None:
    """Deterministic stand-in for the Nominatim lookup
    (morizon.py:427-468): a pure function of the query string, returning
    ``(lat, lon, display_name)``. Queries with a ',' (street-/
    district-level) are unknown for a hash bucket of
    ``unknown_per_mille`` — exercising the fallback chain; a second
    bucket resolves to the WRONG place (the display names a different
    street/city — real Nominatim does this on fuzzy matches, which is
    exactly why gratka.py:326-426 verifies every hit against its query
    terms); bare city queries always resolve and match (the chain
    terminates)."""
    if ("," in query
            and _geo_h64(seed, "gknown", query) % 1000 < unknown_per_mille):
        return None
    lat = round(49.3 + (_geo_h64(seed, "glat", query) / 2.0**64) * 5.3, 6)
    lon = round(14.3 + (_geo_h64(seed, "glon", query) / 2.0**64) * 9.9, 6)
    if ("," in query
            and _geo_h64(seed, "gwrong", query) % 1000 < wrong_per_mille):
        return lat, lon, "Nowa Wieś, powiat nieznany, Polska"
    return lat, lon, f"{query}, Polska"


def geocode_result_matches(level: str, street: str | None,
                           district: str | None, city: str | None,
                           display: str | None) -> bool:
    """Geocode result verification (gratka.py:326-426 ``_addr_has`` /
    display_name containment): a hit is accepted only when its display
    name contains the normalized query terms for its level — city
    always, plus the street for street-level queries and the district
    for district-level queries. Rejected hits fall through to the next
    level of the query chain."""
    from ..functions.urls import slugify
    d = slugify(display or "")
    if city and slugify(city) not in d:
        return False
    if level == "street" and street and slugify(street) not in d:
        return False
    if level == "district" and district and slugify(district) not in d:
        return False
    return True


class GeocodeUnavailable(Exception):
    """A geocode BACKEND transport failure (timeout, non-2xx after the
    retry budget, malformed body) — distinct from an authoritative
    empty result. GeocoderActor treats it as do-not-cache: the query
    resolves to None THIS run but re-geocodes next time, so a backend
    outage can never poison the persistent cache."""


@ray.remote(num_cpus=0.25)
class GeocoderActor:
    """ST4 as a Ray actor: in-memory query→point cache with JSON
    persistence. ``lookup`` is batched (one RPC per fetch batch's
    distinct queries); misses hit the synthetic geocoder and are cached
    + journaled; ``flush`` commits the cache atomically (tmp+rename) so
    a killed run resumes with every previously-resolved query warm."""

    def __init__(self, cache_path: str | None = None, seed: int = 11,
                 backend_factory=None):
        import json
        import os
        self.seed = seed
        # pluggable transport: a zero-arg factory (built INSIDE the
        # actor — HTTP sessions don't ship well) returning a callable
        # ``query -> (lat, lon, display) | None``. None = the
        # deterministic synthetic geocoder; stages/nominatim.py's
        # NominatimBackend is the live-wire implementation.
        self.backend = (backend_factory() if backend_factory is not None
                        else lambda q: synthetic_geocode(q, self.seed))
        self.cache_path = cache_path
        self.cache: dict[str, tuple[float, float] | None] = {}
        self.hits = 0
        self.misses = 0
        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as f:
                loaded = json.load(f)
            # migration: pre-verification caches stored bare (lat, lon)
            # pairs with no display name. Keeping them would make
            # geocode_result_matches reject every warm hit FOREVER (a
            # cache hit never re-geocodes), silently disabling the
            # J4/J5 chain. Dropping them re-resolves each such query
            # once through the miss path and re-caches the full tuple.
            self.cache = {k: (tuple(v) if v is not None else None)
                          for k, v in loaded.items()
                          if v is None or len(v) >= 3}

    def lookup(self, queries: list[str]) -> list[tuple[float, float] | None]:
        out = []
        for q in queries:
            if q in self.cache:
                self.hits += 1
                out.append(self.cache[q])
                continue
            self.misses += 1
            try:
                res = self.backend(q)
            except GeocodeUnavailable:
                # transient outage: answer None NOW, cache NOTHING —
                # caching it would mean the query never re-geocodes
                out.append(None)
                continue
            self.cache[q] = res
            out.append(res)
        return out

    def flush(self) -> int:
        import json
        import os
        if not self.cache_path:
            return len(self.cache)
        tmp = self.cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({k: (list(v) if v is not None else None)
                       for k, v in self.cache.items()}, f)
        os.replace(tmp, self.cache_path)
        return len(self.cache)

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "cached": len(self.cache)}


def geocode_queries(street, district, city) -> list[tuple[str, str]]:
    """The fallback-query chain (gratka.py:326-367), reference-exact:
    1) street+district+city, 2) street+city, 3) district+city, 4) bare
    city ONLY when neither street nor district is present ("TYLKO
    jeśli nie mamy ani ulicy, ani dzielnicy") — an offer with a street
    whose queries all fail geocodes to NOTHING rather than snapping to
    the city centroid. Returns (level, query); level carries the
    verification requirement (street-level queries must match the
    street in the display name, district-level the district)."""
    out = []
    if street and district and city:
        out.append(("street", f"{street}, {district}, {city}"))
    if street and city:
        out.append(("street", f"{street}, {city}"))
    if district and city:
        out.append(("district", f"{district}, {city}"))
    if city and not (street or district):
        out.append(("city", city))
    return out


def geocode_and_snap(ds: rd.Dataset, geocoder, max_dist_m: float = 800.0) -> rd.Dataset:
    """J4+J5 with the miss path: per batch, resolve each offer's
    fallback chain through the cache actor (one batched RPC over the
    batch's distinct queries), take the first resolved level, and snap
    the parsed point when the geocoder's point is >``max_dist_m`` away
    (morizon.py:472-487). Adds lat/lon (possibly snapped), geo_snapped,
    and geo_level ('street'|'district'|'city'|'none')."""

    def snap(t: pa.Table) -> pa.Table:
        streets = t["street"].to_pylist() if "street" in t.column_names else [None] * t.num_rows
        districts = t["district"].to_pylist() if "district" in t.column_names else [None] * t.num_rows
        cities = t["city"].to_pylist()
        chains = [geocode_queries(s, d, c)
                  for s, d, c in zip(streets, districts, cities)]
        distinct = sorted({q for ch in chains for _, q in ch})
        resolved = dict(zip(distinct, ray.get(geocoder.lookup.remote(distinct))))
        lat = np.asarray(t["lat"], dtype=np.float64).copy()
        lon = np.asarray(t["lon"], dtype=np.float64).copy()
        snapped = np.zeros(t.num_rows, dtype=bool)
        levels = []
        for i, ch in enumerate(chains):
            pt, lvl = None, "none"
            for level, q in ch:
                r = resolved.get(q)
                if r is None:
                    continue
                # result verification (gratka.py:326-426): reject hits
                # whose canonical name matches none of the query terms
                # (wrong-place fuzzy matches, poisoned cache entries)
                if not geocode_result_matches(level, streets[i],
                                              districts[i], cities[i],
                                              r[2] if len(r) > 2 else None):
                    continue
                pt, lvl = (r[0], r[1]), level
                break
            levels.append(lvl)
            if pt is None or np.isnan(lat[i]):
                continue
            d = float(haversine_m(lat[i], lon[i], pt[0], pt[1]))
            if d > max_dist_m:
                lat[i], lon[i] = pt
                snapped[i] = True
        t = t.drop_columns(["lat", "lon"])
        return (t.append_column("lat", pa.array(lat))
                 .append_column("lon", pa.array(lon))
                 .append_column("geo_snapped", pa.array(snapped))
                 .append_column("geo_level", pa.array(levels, pa.string())))

    return ds.map_batches(snap, batch_format="pyarrow")


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
