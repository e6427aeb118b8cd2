"""Pure-numpy k-d tree (functions/kdtree.py): exact-NN equality with
brute force on random gazetteers, sphere-geometry edge cases (date
line, poles), degenerate duplicate points, and the ReverseGeocoder
brute/tree path equivalence."""

import numpy as np
import pyarrow as pa

from realestate_scraper_ray.functions.kdtree import (KDTree, SphereNN,
                                                     chord_to_haversine_m,
                                                     sphere_xyz)
from realestate_scraper_ray.stages.geo import ReverseGeocoder, haversine_m


def test_kdtree_exact_vs_bruteforce():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(5000, 3))
    q = rng.normal(size=(800, 3))
    tree = KDTree(pts, leaf_size=16)
    idx, dist = tree.query(q)
    d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    bi = np.argmin(d2, axis=1)
    # ties: compare distances, not indices
    np.testing.assert_allclose(dist ** 2, d2[np.arange(len(q)), bi],
                               rtol=1e-12, atol=1e-12)
    exact = idx == bi
    ties = ~exact
    if ties.any():
        np.testing.assert_allclose(
            d2[np.flatnonzero(ties), idx[ties]],
            d2[np.flatnonzero(ties), bi[ties]], rtol=1e-12)


def test_kdtree_duplicates_and_tiny():
    pts = np.zeros((100, 3))  # fully degenerate
    tree = KDTree(pts, leaf_size=4)
    idx, dist = tree.query(np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]))
    assert (dist == [0.0, 1.0]).all()
    one = KDTree(np.array([[1.0, 2.0, 3.0]]))
    idx, dist = one.query(np.array([[1.0, 2.0, 3.0]]))
    assert idx[0] == 0 and dist[0] == 0.0


def test_sphere_nn_dateline_and_poles():
    # gazetteer points straddling the date line + both poles: a raw
    # lat/lon-degree tree gets these wrong, the 3-D chord tree must not
    lat = np.array([0.0, 0.0, 89.9, -89.9, 52.0])
    lon = np.array([179.9, -179.9, 10.0, 10.0, 21.0])
    nn = SphereNN(lat, lon, leaf_size=2)
    qi, qd = nn.query(np.array([0.0]), np.array([-179.95]))
    assert qi[0] == 1
    qi2, _ = nn.query(np.array([0.0]), np.array([179.95]))
    assert qi2[0] == 0
    qi3, _ = nn.query(np.array([89.99]), np.array([-120.0]))
    assert qi3[0] == 2  # near-pole query: longitude nearly irrelevant


def test_sphere_nn_matches_haversine_bruteforce():
    rng = np.random.default_rng(11)
    glat = rng.uniform(-80, 80, 5000)
    glon = rng.uniform(-180, 180, 5000)
    qlat = rng.uniform(-80, 80, 400)
    qlon = rng.uniform(-180, 180, 400)
    nn = SphereNN(glat, glon)
    idx, dist = nn.query(qlat, qlon)
    d = haversine_m(qlat[:, None], qlon[:, None],
                    glat[None, :], glon[None, :])
    bi = np.argmin(d, axis=1)
    bd = d[np.arange(len(bi)), bi]
    np.testing.assert_allclose(dist, bd, rtol=1e-9, atol=1e-6)
    agree = idx == bi
    if not agree.all():  # haversine ties
        np.testing.assert_allclose(d[np.flatnonzero(~agree), idx[~agree]],
                                   bd[~agree], rtol=1e-9)


def test_reverse_geocoder_tree_equals_brute():
    rng = np.random.default_rng(5)
    cents = {f"c{i}": (float(rng.uniform(49, 55)),
                       float(rng.uniform(14, 24))) for i in range(600)}
    batch = pa.table({
        "lat": rng.uniform(49, 55, 300),
        "lon": rng.uniform(14, 24, 300)})
    brute = ReverseGeocoder(cents, kdtree_min=10_000)
    tree = ReverseGeocoder(cents, kdtree_min=1)
    assert brute.nn is None and tree.nn is not None
    rb = brute(batch)
    rt = tree(batch)
    assert rb["city_pred"].to_pylist() == rt["city_pred"].to_pylist()
    np.testing.assert_allclose(rb["city_dist_m"].to_numpy(),
                               rt["city_dist_m"].to_numpy(), atol=0.1)


def test_chord_roundtrip():
    # 180° apart on the equator: chord 2 → half circumference
    m = chord_to_haversine_m(np.array([2.0]))
    assert abs(m[0] - np.pi * 6_371_000.0) < 1.0
    assert chord_to_haversine_m(np.array([0.0]))[0] == 0.0
