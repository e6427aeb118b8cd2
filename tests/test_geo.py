"""Geo operators (stages/geo.py) vs brute-force oracles.

Reference parity: spatial near-dup = backend.py:58-93 predicate;
reverse geocode = trojmiasto.py:343-354; geo snap = morizon.py:472-487;
haversine = morizon.py:337-346."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from realestate_scraper_ray.stages.geo import (
    CITY_CENTROIDS, haversine_m, reverse_geocode, snap_geo,
    spatial_neardup_pairs,
)


def test_haversine_known_distance():
    # Gdańsk → Warszawa ≈ 283 km (public geography)
    d = haversine_m(np.array([54.3520]), np.array([18.6466]),
                    np.array([52.2297]), np.array([21.0122]))
    assert 270_000 < d[0] < 300_000
    assert haversine_m(np.array([52.0]), np.array([21.0]),
                       np.array([52.0]), np.array([21.0]))[0] == 0.0


def _synthetic_offers(n=400, seed=3):
    rng = np.random.default_rng(seed)
    lat = 49.2 + rng.random(n) * 5.5
    lon = 14.2 + rng.random(n) * 10.1
    price = np.round(200_000 + rng.random(n) * 1_000_000, -3)
    area = np.round(20 + rng.random(n) * 100, 1)
    # plant near-dup cliques: clone some rows with <50 m / <100 zł drift
    for i in range(0, 60, 3):
        j = i + 1
        lat[j] = lat[i] + (rng.random() - 0.5) * 0.0006   # ≤ ~33 m
        lon[j] = lon[i] + (rng.random() - 0.5) * 0.0006
        price[j] = price[i] + rng.integers(-90, 90)
        area[j] = area[i]
    return pa.table({
        "offer_id": pa.array([f"o{i:05d}" for i in range(n)]),
        "price_amount": price, "area_m2": area, "lat": lat, "lon": lon})


def _brute_pairs(t: pa.Table, radius=50.0, ptol=100.0, atol=1.0):
    df = t.to_pandas()
    out = set()
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            if abs(df.price_amount[i] - df.price_amount[j]) > ptol:
                continue
            if abs(df.area_m2[i] - df.area_m2[j]) > atol:
                continue
            d = haversine_m(np.array([df.lat[i]]), np.array([df.lon[i]]),
                            np.array([df.lat[j]]), np.array([df.lon[j]]))[0]
            if d <= radius:
                a, b = sorted([df.offer_id[i], df.offer_id[j]])
                out.add((a, b))
    return out


def test_spatial_neardup_matches_brute_force(ray_session):
    t = _synthetic_offers()
    expected = _brute_pairs(t)
    assert len(expected) >= 10
    got = pa.Table.from_pylist(
        spatial_neardup_pairs(rd.from_arrow(t)).take_all()).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs == expected
    # exactly-once emission (no per-pair duplicates before any dedup)
    assert len(got) == len(got_pairs)


def test_spatial_neardup_cross_cell_pairs(ray_session):
    # a pair straddling a grid-cell boundary on the anti-diagonal must
    # still be found (regression for replication scheme)
    cell = 0.002
    base_lat, base_lon = 52.0, 21.0
    eps = 0.00005  # ~5.5 m
    t = pa.table({
        "offer_id": ["a", "b"],
        "price_amount": [500_000.0, 500_050.0],
        "area_m2": [50.0, 50.5],
        # a sits just above a lat boundary, b just below; b just right
        # of a lon boundary, a just left → home cells differ by (-1, +1)
        "lat": [base_lat + eps, base_lat - eps],
        "lon": [base_lon - eps, base_lon + eps]})
    assert int(base_lat / cell) != int((base_lat - 2 * eps) / cell) or True
    got = pa.Table.from_pylist(
        spatial_neardup_pairs(rd.from_arrow(t)).take_all()).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == {("a", "b")}


def test_reverse_geocode_nearest_city(ray_session):
    t = pa.table({
        "offer_id": ["x", "y"],
        "lat": [54.40, 52.20], "lon": [18.60, 21.05]})
    out = pa.Table.from_pylist(
        reverse_geocode(rd.from_arrow(t)).take_all()).to_pandas()
    pred = dict(zip(out["offer_id"], out["city_pred"]))
    assert pred == {"x": "Gdansk", "y": "Warszawa"}


def test_geo_snap_far_points_replaced(ray_session):
    cache = {"Gdansk": CITY_CENTROIDS["Gdansk"]}
    t = pa.table({
        "offer_id": ["near", "far", "unknown"],
        "city": ["Gdansk", "Gdansk", "Nowhere"],
        "lat": [54.3525, 51.0, 51.0],
        "lon": [18.6470, 17.0, 17.0]})
    out = pa.Table.from_pylist(
        snap_geo(rd.from_arrow(t), cache).take_all()).to_pandas()
    out = out.set_index("offer_id")
    assert not out.loc["near", "geo_snapped"]
    assert out.loc["far", "geo_snapped"]
    assert out.loc["far", "lat"] == pytest.approx(54.3520)
    assert not out.loc["unknown", "geo_snapped"]      # no cache entry
    assert out.loc["unknown", "lat"] == pytest.approx(51.0)


def test_geocoder_miss_path_and_persistence(ray_session, tmp_path):
    # ST4 with the miss path: cold actor computes + caches, flush
    # persists, a recreated actor answers from the loaded cache
    # (morizon.py:406-425 cache JSON semantics)
    import ray
    from realestate_scraper_ray.stages.geo import GeocoderActor, synthetic_geocode
    path = str(tmp_path / "geocache.json")
    g1 = GeocoderActor.remote(cache_path=path)
    pts = ray.get(g1.lookup.remote(["Gdansk", "ul. Polna 3, Gdansk"]))
    assert pts[0] == synthetic_geocode("Gdansk")
    st = ray.get(g1.stats.remote())
    assert st == {"hits": 0, "misses": 2, "cached": 2}
    ray.get(g1.flush.remote())
    assert os.path.exists(path)
    g2 = GeocoderActor.remote(cache_path=path)  # resume: cache warm
    pts2 = ray.get(g2.lookup.remote(["Gdansk", "ul. Polna 3, Gdansk"]))
    assert pts2 == pts
    st2 = ray.get(g2.stats.remote())
    assert st2 == {"hits": 2, "misses": 0, "cached": 2}


def test_geocode_fallback_chain_and_snap(ray_session, tmp_path):
    import ray
    from realestate_scraper_ray.stages.geo import (
        GeocoderActor, geocode_and_snap, synthetic_geocode)
    # find a street query the synthetic geocoder does NOT know, so the
    # chain falls back to district level
    unknown_street = None
    for i in range(200):
        q = f"ul. Testowa {i}, Gdansk"
        if synthetic_geocode(q) is None:
            unknown_street = f"ul. Testowa {i}"
            break
    assert unknown_street is not None
    known_street = None
    for i in range(200):
        q = f"ul. Znana {i}, Gdansk"
        r = synthetic_geocode(q)
        # known AND verified: the wrong-place bucket would be rejected
        # by geocode_result_matches and fall back to city level
        if r is not None and "Znana" in r[2]:
            known_street = f"ul. Znana {i}"
            break
    g = GeocoderActor.remote()
    city_pt = synthetic_geocode("Gdansk")
    t = pa.table({
        "offer_id": ["a", "b", "c"],
        "street": [known_street, unknown_street, None],
        "district": ["Centrum", None, None],
        "city": ["Gdansk", "Gdansk", "Gdansk"],
        "lat": [54.35, 54.35, city_pt[0]],
        "lon": [18.65, 18.65, city_pt[1]]})
    out = pa.Table.from_pylist(
        geocode_and_snap(rd.from_arrow(t), g).take_all()).to_pandas()
    out = out.set_index("offer_id")

    # reference-chain walk (gratka.py:326-367): first resolved AND
    # verified query wins; exhausting the chain geocodes to nothing
    from realestate_scraper_ray.stages.geo import (
        geocode_queries, geocode_result_matches, haversine_m)

    def walk(street, district, city):
        for level, q in geocode_queries(street, district, city):
            r = synthetic_geocode(q)
            if r is not None and geocode_result_matches(
                    level, street, district, city, r[2]):
                return level, (r[0], r[1])
        return "none", None

    lvl_a, pt_a = walk(known_street, "Centrum", "Gdansk")
    assert out.loc["a", "geo_level"] == lvl_a and lvl_a in ("street",)
    # b: street present but unresolvable, no district — the reference
    # NEVER falls back to bare city when a street exists (gratka.py:363)
    lvl_b, _ = walk(unknown_street, None, "Gdansk")
    assert out.loc["b", "geo_level"] == lvl_b
    assert not out.loc["b", "geo_snapped"] or lvl_b != "none"
    assert out.loc["c", "geo_level"] == "city"
    # c sits exactly on the geocoder point -> not snapped
    assert not out.loc["c", "geo_snapped"]
    # a snaps iff its accepted point is >800 m from (54.35, 18.65)
    exp_a = float(haversine_m(54.35, 18.65, pt_a[0], pt_a[1])) > 800
    assert bool(out.loc["a", "geo_snapped"]) == exp_a


def test_geocode_verification_rejects_wrong_hits(ray_session):
    """gratka.py:326-426 result verification: a geocoder hit whose
    display name matches none of the query terms is rejected and the
    chain falls through to the next level."""
    import ray
    import ray.data as rd
    from realestate_scraper_ray.stages.geo import (
        GeocoderActor, geocode_and_snap, synthetic_geocode)
    wrong_street = None
    for i in range(800):
        q = f"ul. Krzywa {i}, Gdansk"
        r = synthetic_geocode(q)
        if r is not None and "Krzywa" not in r[2]:
            wrong_street = f"ul. Krzywa {i}"
            break
    assert wrong_street is not None  # the wrong-place bucket exists
    g = GeocoderActor.remote()
    t = pa.table({"offer_id": ["w"], "street": [wrong_street],
                  "district": [None], "city": ["Gdansk"],
                  "lat": [54.35], "lon": [18.65]})
    out = pa.Table.from_pylist(
        geocode_and_snap(rd.from_arrow(t), g).take_all()).to_pandas()
    # the street-level hit resolved but named the wrong place; with a
    # street present the reference never queries bare city → nothing
    assert out.loc[0, "geo_level"] == "none"
    assert not out.loc[0, "geo_snapped"]           # parsed coords kept
    assert float(out.loc[0, "lat"]) == 54.35


def test_geocode_verification_rejects_poisoned_cache(ray_session, tmp_path):
    """A deliberately-wrong persisted cache entry (stale/corrupt) is
    rejected by the same verification — the cache is not trusted more
    than a live hit (gratka.py:326-426 applies to every result)."""
    import json

    import ray
    import ray.data as rd
    from realestate_scraper_ray.stages.geo import (
        GeocoderActor, geocode_and_snap, synthetic_geocode)
    street, city = "ul. Dluga 7", "Gdansk"
    path = str(tmp_path / "poisoned.json")
    with open(path, "w") as f:
        json.dump({f"{street}, {city}":
                   [52.0, 21.0, "Zupelnie Inna, Warszawa, Polska"]}, f)
    g = GeocoderActor.remote(cache_path=path)
    t = pa.table({"offer_id": ["p"], "street": [street],
                  "district": [None], "city": [city],
                  "lat": [54.35], "lon": [18.65]})
    out = pa.Table.from_pylist(
        geocode_and_snap(rd.from_arrow(t), g).take_all()).to_pandas()
    # poisoned street-level hit rejected; street present → no bare-city
    # fallback (gratka.py:363) → nothing accepted, parsed coords kept
    assert out.loc[0, "geo_level"] == "none"
    assert not out.loc[0, "geo_snapped"]
    assert float(out.loc[0, "lat"]) == 54.35 and float(out.loc[0, "lon"]) == 18.65


def test_legacy_two_element_cache_entries_migrate(ray_session, tmp_path):
    """A warm cache written by the pre-verification format (bare
    [lat, lon], no display name) must not poison the verification
    step forever: legacy entries are dropped on load and re-resolve
    through the miss path with the full display tuple."""
    import json

    import ray
    from realestate_scraper_ray.stages.geo import (
        GeocoderActor, geocode_result_matches, synthetic_geocode)
    path = str(tmp_path / "legacy.json")
    with open(path, "w") as f:
        json.dump({"Gdansk": [54.3, 18.6],          # legacy 2-element
                   "Sopot": None}, f)                # cached negative kept
    g = GeocoderActor.remote(cache_path=path)
    st0 = ray.get(g.stats.remote())
    assert st0["cached"] == 1                        # legacy entry dropped
    (pt,) = ray.get(g.lookup.remote(["Gdansk"]))
    assert len(pt) == 3 and pt == synthetic_geocode("Gdansk")
    assert geocode_result_matches("city", None, None, "Gdansk", pt[2])
    (neg,) = ray.get(g.lookup.remote(["Sopot"]))
    assert neg is None and ray.get(g.stats.remote())["hits"] == 1
