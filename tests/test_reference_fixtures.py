"""Reference-fixture parity: run the engine's extractor chain on the
reference's OWN fixture HTML (scrapper/tests/test_otodom_selectors.py
HTML_LISTING / HTML_OFFER, test_images.py MIN_JPEG) and assert the
reference's exact expected values — the cheapest available ground truth
for real-markup behavior. The fixtures are loaded from the read-only
reference tree at test time (data, not code); tests skip if the tree is
absent.

Also exercises the tolerant-parse layer (stages/htmlparse.py, the
analogue of core/parse.py:10-26): attribute reordering, unquoted and
single-quoted attributes, broken nesting.
"""

import ast
import hashlib
import os

import pytest

from realestate_scraper_ray.pipelines.oracle import parse_offer_spans
from realestate_scraper_ray.stages.fetch import html_to_spans
from realestate_scraper_ray.stages.htmlparse import parse_html
from realestate_scraper_ray.stages.portals import (
    extract_offer_links,
    listing_links_generic,
    listing_links_gratka,
    listing_links_morizon,
    listing_links_otodom,
    parse_ld_json_offer,
)

_FIXTURE_FILE = "/root/reference/scrapper/tests/test_otodom_selectors.py"


def _load_fixtures() -> dict[str, str]:
    """Pull the HTML_* string constants out of the reference's test
    module without importing it (its imports aren't installable here)."""
    if not os.path.exists(_FIXTURE_FILE):
        pytest.skip("reference tree not available")
    tree = ast.parse(open(_FIXTURE_FILE).read())
    out: dict[str, str] = {}
    for node in tree.body:
        if (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and isinstance(node.value, ast.Constant)
                and isinstance(node.value.value, str)):
            out[node.targets[0].id] = node.value.value
    return out


@pytest.fixture(scope="module")
def fixtures():
    return _load_fixtures()


def test_reference_listing_links_extraction(fixtures):
    """test_otodom_selectors.py:59-63 expectations, verbatim."""
    links = extract_offer_links(fixtures["HTML_LISTING"])
    assert any("ID123456" in u for u in links)
    assert any("ID654321" in u for u in links)
    assert all(u.startswith("https://") for u in links)


def test_reference_offer_ldjson_parse_basic_fields(fixtures):
    """test_otodom_selectors.py:66-73 expectations, verbatim."""
    data = parse_ld_json_offer(fixtures["HTML_OFFER"])
    assert data["title"].startswith("Mieszkanie")
    assert data["price_amount"] == 499000.0
    assert data["price_currency"] == "PLN"
    assert data["city"] == "Gdańsk"
    assert data["lat"] == 54.35 and data["lon"] == 18.65
    assert len(data["photos_from_json"]) == 2


def test_reference_offer_through_engine_chain(fixtures):
    """The same fixture through the engine's production path
    (html_to_spans → parse_offer_spans): exact reference values +
    0-based photo seq (test_otodom_selectors.py:76-87)."""
    spans = html_to_spans(fixtures["HTML_OFFER"],
                          "https://www.otodom.pl/pl/oferta/"
                          "gdansk-super-mieszkanie-ID123456")
    offer, photos = parse_offer_spans(spans)
    assert offer["price_amount"] == 499000.0
    assert offer["price_currency"] == "PLN"
    assert offer["city"] == "Gdańsk"
    assert offer["lat"] == 54.35 and offer["lon"] == 18.65
    assert offer["rooms"] == 2
    assert offer["street"] == "Testowa 1"  # clean_street drops 'ul.'
    assert len(photos) == 2
    # photo seq is the 0-based list index (seq==0 for the first photo)
    assert photos[0] == "https://img.otodom.pl/photos1.jpg"


def test_reference_min_jpeg_download_semantics(tmp_path):
    """test_images.py:19-42 expectations through the engine's media
    helpers: sniff → sha256 → {source}/{offer_id}/{seq:03d}.{ext}."""
    from realestate_scraper_ray.stages.media import photo_path, sniff_mime
    min_jpeg = b"\xFF\xD8\xFF" + b"\x00" * 1024
    mime, ext = sniff_mime(min_jpeg)
    assert mime == "image/jpeg" and ext == "jpg"
    sha = hashlib.sha256(min_jpeg).hexdigest()
    assert sha and len(sha) == 64
    path = photo_path(str(tmp_path), "otodom", "ID123456", 0, ext)
    assert path == str(tmp_path) + "/otodom/ID123456/000.jpg"


# ---------------------------------------------------------------------------
# tolerant parsing (core/parse.py semantics on mangled markup)
# ---------------------------------------------------------------------------

_MANGLED_LISTING = """
<html><body>
<article data-sentry-element=Container class=c1>
  <a href=/pl/oferta/gdansk-a-ID111 data-cy=listing-item-link>A</a>
<article class='c2' data-sentry-element='Container'>
  <a data-cy='listing-item-link' href='/pl/oferta/gdansk-b-ID222'>B</a>
</article>
<div><a href="/pl/oferta/gdansk-c-ID333" class="x" data-cy="listing-item-link">C</a>
</body></html>
"""


def test_tolerant_dom_survives_mangled_markup():
    """Unquoted attrs, single quotes, reordered attributes, an
    unclosed <article>, and a stray </body> all parse; anchors are
    found in document order with correct hrefs."""
    root = parse_html(_MANGLED_LISTING)
    anchors = root.find_all("a", attrs={"data-cy": "listing-item-link"})
    assert [a.get("href") for a in anchors] == [
        "/pl/oferta/gdansk-a-ID111", "/pl/oferta/gdansk-b-ID222",
        "/pl/oferta/gdansk-c-ID333"]
    # card lookup through parent pointers despite the unclosed article
    assert anchors[0].ancestor("article").get("class") == "c1"


def test_tolerant_extractors_on_mangled_markup():
    """The crawl-path extractors handle the same mangled document:
    otodom by href pattern, generic by the data-cy card marker."""
    base = "https://www.otodom.pl"
    got = listing_links_otodom(_MANGLED_LISTING, base)
    assert got == [f"{base}/pl/oferta/gdansk-a-ID111",
                   f"{base}/pl/oferta/gdansk-b-ID222",
                   f"{base}/pl/oferta/gdansk-c-ID333"]
    got = listing_links_generic(_MANGLED_LISTING, base)
    assert [u.rsplit("-", 1)[1] for u in got] == ["ID111", "ID222", "ID333"]


def test_gratka_city_filter_and_fallback():
    html = """
    <article data-cy="listing-item"><a href="/nieruchomosci/m-1/ob/123">M
    </a><div data-cy="listing-item-location">Gdańsk, pomorskie</div></article>
    <article data-cy="listing-item"><a href="/nieruchomosci/m-2/ob/456">M
    </a><div data-cy="listing-item-location">Praga, Czechy</div></article>
    <a href="/mieszkania?page=2">next</a>
    """
    base = "https://pomorskie.gratka.pl"
    got = listing_links_gratka(html, base, "Gdansk")
    assert got == [f"{base}/nieruchomosci/m-1/ob/123",
                   f"{base}/mieszkania?page=2"]
    # no card matches the city → fallback takes every /ob/ link
    got = listing_links_gratka(html, base, "Lublin")
    assert got[:2] == [f"{base}/nieruchomosci/m-1/ob/123",
                       f"{base}/nieruchomosci/m-2/ob/456"]


def test_morizon_mzn_pattern_and_relative_hrefs():
    html = """
    <a href="https://x.morizon.pl/oferta/m-1-mzn30001111">abs</a>
    <a href="/oferta/m-2-mzn30002222">rel</a>
    <a href="https://www.morizon.pl/kredyty/hipoteczny">decoy</a>
    <a href="/oferta/m-1-mzn30001111">dup</a>
    """
    base = "https://x.morizon.pl"
    got = listing_links_morizon(html, base)
    assert got == ["https://x.morizon.pl/oferta/m-1-mzn30001111",
                   f"{base}/oferta/m-2-mzn30002222"]


def test_otodom_investment_badge_rule():
    html = """
    <article data-sentry-element="Container"><aside class="evkld750-b">I
    </aside><span>Ukończona</span>
    <a data-cy="listing-item-link" href="/pl/inwestycja/osiedle-1-ID9">x</a>
    </article>
    <article data-sentry-element="Container"><aside class="evkld750-b">I
    </aside><span>W budowie</span>
    <a data-cy="listing-item-link" href="/pl/inwestycja/osiedle-2-ID8">x</a>
    </article>
    """
    got = listing_links_otodom(html, "https://www.otodom.pl")
    assert got == ["https://www.otodom.pl/pl/inwestycja/osiedle-1-ID9"]
