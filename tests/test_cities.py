"""City canonicalization (J6, cities_rename.py:63-109 semantics)."""

import pyarrow as pa
import ray.data as rd

from realestate_scraper_ray.functions.cities import (
    CANONICAL_CITIES, build_canonical_map, canonicalize_cities, city_key,
)


def test_ambiguous_keys_dropped():
    m = build_canonical_map(CANONICAL_CITIES)
    assert "ambig" not in m           # two official names share the key
    assert m["gdansk"] == "Gdańsk"
    assert m["lodz"] == "Łódź"


def test_city_key_deaccents():
    assert city_key("Gdańsk") == "gdansk"
    assert city_key("Łódź") == "lodz"
    assert city_key("  KRAKÓW  ") == "krakow"


def test_canonicalize_on_crawl_cities(ray_session):
    t = pa.table({"offer_id": ["1", "2", "3", "4"],
                  "city": ["GDANSK", "Łódź", "ambig", "Nowhere"]})
    out = pa.Table.from_pylist(
        canonicalize_cities(rd.from_arrow(t), "city").take_all()).to_pandas()
    got = dict(zip(out["offer_id"], out["city_canon"]))
    # ambiguous + unknown rows dropped; diacritic/case variants resolve
    assert got == {"1": "Gdańsk", "2": "Łódź"}
