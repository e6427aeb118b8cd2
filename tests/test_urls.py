"""Unit tests for the URL kernel library (scalar vs vectorized agreement)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from realestate_scraper_ray.functions.urls import (
    canonicalize_urls, coerce_float, coerce_floats, extract_offer_ids,
    host_of, normalize_url, offer_id_of, parse_polish_dates, slugify,
    split_host,
)


def test_normalize_url_semantics():
    # dedup.py:7-14: strip fragment, rstrip path '/', sort query params
    assert normalize_url("https://x.pl/a/b/?b=2&a=1#frag") == "https://x.pl/a/b?a=1&b=2"
    assert normalize_url("https://x.pl/") == "https://x.pl"
    assert normalize_url("https://x.pl/a?z=1") == "https://x.pl/a?z=1"
    assert normalize_url("https://x.pl/a") == "https://x.pl/a"


@given(st.lists(st.from_regex(
    r"https://[a-z]{1,8}\.pl(/[a-z0-9]{1,6}){0,3}/?(\?([a-z]=[0-9]&){0,3}[a-z]=[0-9])?(#[a-z]{0,4})?",
    fullmatch=True), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_canonicalize_vectorized_matches_scalar(urls):
    vec = canonicalize_urls(urls).to_pylist()
    assert vec == [normalize_url(u) for u in urls]


def test_split_host():
    urls = ["https://a.otodom.pl/x/y", "https://img.gratka.pl/1.jpg?x=1"]
    assert split_host(urls).to_pylist() == ["a.otodom.pl", "img.gratka.pl"]
    assert [host_of(u) for u in urls] == ["a.otodom.pl", "img.gratka.pl"]


def test_extract_offer_ids_all_portals():
    urls = [
        "https://pom.otodom.pl/pl/oferta/mieszkanie-1-ID1000000001",
        "https://pom.morizon.pl/oferta/mieszkanie-2-mzn3000000002",
        "https://pom.gratka.pl/nieruchomosci/mieszkanie-3/ob/2000000003",
        "https://ogloszenia.trojmiasto.pl/nieruchomosci/mieszkanie-4-ogl4000000004",
        "https://x.pl/no-id-here",
    ]
    ids = extract_offer_ids(urls).to_pylist()
    assert ids == ["1000000001", "3000000002", "2000000003", "4000000004", None]
    assert [offer_id_of(u) for u in urls] == ids


def test_coerce_polish_numbers():
    # unified parser semantics of otodom.py:194-208 / morizon.py:60-69 /
    # gratka.py:96-108 / trojmiasto.py:34-49
    texts = ["1 234 567 zł", "12,5 m²", "549 000", "od 300,99", None, "brak"]
    vals = coerce_floats(texts).to_pylist()
    assert vals == [1234567.0, 12.5, 549000.0, 300.99, None, None]
    assert [coerce_float(t) if t is not None else None for t in texts] == vals


def test_slugify():
    assert slugify("Zielona Góra") == "zielona-gora"
    assert slugify("Łódź") == "lodz"
    assert slugify("Kraków  ul. Świętej 3") == "krakow-ul-swietej-3"


def test_parse_polish_dates():
    ts = parse_polish_dates(["15.01.2026 12:30", "2026-01-15T12:30:00",
                             "01.02.2024", "garbage"]).to_pylist()
    assert ts[0] == ts[1]
    assert ts[2].month == 2 and ts[2].day == 1
    assert ts[3] is None


def test_canonicalize_arrow_input():
    arr = pa.array(["https://x.pl/a/#f", "https://y.pl/?b=1&a=2"])
    assert canonicalize_urls(arr).to_pylist() == ["https://x.pl/a", "https://y.pl?a=2&b=1"]


def test_build_proxies_and_city_in_text():
    # S5 (http.py:105-111) + M29 (gratka.py:89-93)
    from realestate_scraper_ray.stages.fetch import FetchParse, build_proxies
    from realestate_scraper_ray.config import CrawlConfig, PortalConfig
    from realestate_scraper_ray.functions.cities import city_in_text
    assert build_proxies(None, None) is None
    assert build_proxies("http://p:8080", None) == {"http://": "http://p:8080"}
    assert build_proxies("http://p:8080", "http://s:8443") == {
        "http://": "http://p:8080", "https://": "http://s:8443"}
    fp = FetchParse(PortalConfig(), CrawlConfig(proxy_http="http://p:8080"))
    assert fp.proxies == {"http://": "http://p:8080"}
    mask = city_in_text(["Gdańsk Wrzeszcz", "GDANSK!", "Sopot", "Warszawa"],
                        "Gdańsk")
    assert mask.to_pylist() == [True, True, False, False]


def test_prose_price_extraction_reference_semantics():
    """M13: first number before zł/PLN is the total (gratka.py:20-21),
    zł/m² number is the per-m² price, blockers null everything
    (otodom.py:435-437)."""
    from realestate_scraper_ray.functions.urls import (
        coerce_float, prices_from_text,
    )
    t, p, blocked = prices_from_text(
        "Cena 1 500 000 zł (19868,42 zł/m²). Okazja!")
    assert not blocked
    assert coerce_float(t) == 1500000.0
    assert coerce_float(p) == 19868.42
    for phrase in ("Zarezerwowano", "ZAPYTAJ O CENĘ", "brak ceny",
                   "Cena do uzgodnienia"):
        t, p, blocked = prices_from_text(f"{phrase} — 999 zł")
        assert blocked and t is None and p is None
    assert prices_from_text("bez ceny w tekście") == (None, None, False)
    assert prices_from_text(None) == (None, None, False)


def test_prose_area_rooms_reference_semantics():
    """M14 (morizon.py:289-312): ranges stripped, price-context m²
    excluded, largest in [10,1000] wins, rooms = first 'N pokoje'."""
    from realestate_scraper_ray.functions.urls import (
        area_rooms_from_text, coerce_float,
    )
    a, r = area_rooms_from_text(
        "garaż 25 m² oraz mieszkanie 80,5 m², taras 12–18 m², "
        "cena 10 000 zł/m² czyli 800 m² nie liczy się; 4 pokoje")
    assert coerce_float(a) == 80.5      # largest valid; 800 is price ctx
    assert r == "4"
    a, _ = area_rooms_from_text("piwnica 8 m² i hala 1200 m²")
    assert a is None                     # both outside [10, 1000]
    a, _ = area_rooms_from_text("metraż 55 m2 brutto")
    assert coerce_float(a) == 55.0       # 'm2' spelling accepted
    assert area_rooms_from_text("") == (None, None)


def test_clean_street_reference_semantics():
    """M15 (gratka.py:501-517): one leading street-type prefix is
    stripped, separators collapse, letterless remainders become None."""
    from realestate_scraper_ray.functions.urls import clean_street
    assert clean_street("ul. Polna 12") == "Polna 12"
    assert clean_street("  Aleja   Zwycięstwa , 7 ") == "Zwycięstwa 7"
    assert clean_street("plac Wolności") == "Wolności"
    assert clean_street("osiedle Słoneczne 3") == "Słoneczne 3"
    assert clean_street("Krótka 5") == "Krótka 5"     # no prefix → kept
    assert clean_street("ulicami miasta") == "ulicami miasta"  # not a prefix+space
    assert clean_street("ul. 123") is None            # digits only
    assert clean_street("") is None and clean_street(None) is None
