"""HTML extractor-chain unit tests on canned fixtures — the semantics
of the reference's own unit tests
(/root/reference/scrapper/tests/test_otodom_selectors.py:12-86:
listing-link extraction, LD+JSON Product parse with exact field
assertions, photo seq ordering) plus merge precedence (M31,
otodom.py:628-665), Leaflet geo fallback (M17) and srcset argmax (M26).
"""

from realestate_scraper_ray.pipelines.oracle import parse_offer_spans
from realestate_scraper_ray.stages.fetch import (
    best_from_srcset, extract_ldjson_fields, extract_listing_links,
    html_to_spans,
)

LISTING_FIXTURE = """
<html><body>
<article data-cy="listing-item">
  <a data-cy="listing-item-link" href="https://x.otodom.pl/pl/oferta/m-1-ID100200300">oferta</a>
</article>
<div class="noise"><a href="https://x.otodom.pl/pl/pomoc">pomoc</a></div>
<article data-cy="listing-item">
  <a class="x" data-cy="listing-item-link" href="https://x.otodom.pl/pl/oferta/m-2-ID100200301">oferta</a>
</article>
</body></html>
"""

# fixture LD+JSON mirroring the reference's test_otodom_selectors.py:19-45
# (Product: title/price 499000.0/PLN/Gdańsk/54.35/18.65/2 photos)
LD_FIXTURE = """
<html><head>
<script type="application/ld+json">
{"@context":"https://schema.org","@graph":[
 {"@type":"BreadcrumbList","itemListElement":[{"@type":"ListItem","position":1}]},
 {"@type":"Product","name":"Mieszkanie 3 pok. Gdansk",
  "offers":{"@type":"Offer","price":499000.0,"priceCurrency":"PLN"},
  "geo":{"@type":"GeoCoordinates","latitude":54.35,"longitude":18.65},
  "address":{"@type":"PostalAddress","addressLocality":"Gdańsk"},
  "floorSize":{"@type":"QuantitativeValue","value":56.5},
  "numberOfRooms":3,
  "image":["https://img.x.pl/1/0.jpg","https://img.x.pl/1/1.jpg"]}]}
</script></head><body></body></html>
"""


def test_listing_links_extraction():
    # test_otodom_selectors.py:59-63 semantics: both offer links found,
    # absolute https URLs, noise anchors excluded
    links = extract_listing_links(LISTING_FIXTURE)
    assert len(links) == 2
    assert all(u.startswith("https://") for u in links)
    assert "ID100200300" in links[0] and "ID100200301" in links[1]


def test_offer_ldjson_parse_basic_fields():
    # test_otodom_selectors.py:66-73 semantics: exact field values
    fields, images = extract_ldjson_fields(LD_FIXTURE)
    assert fields["title"] == "Mieszkanie 3 pok. Gdansk"
    assert float(fields["price_amount"]) == 499000.0
    assert fields["price_currency"] == "PLN"
    assert fields["city"] == "Gdańsk"
    assert float(fields["lat"]) == 54.35
    assert float(fields["lon"]) == 18.65
    assert float(fields["area_m2"]) == 56.5
    assert int(fields["rooms"]) == 3
    assert len(images) == 2


def test_parse_offer_photo_seq_starts_at_zero():
    # test_otodom_selectors.py:76-86 semantics: photos[0].seq == 0
    spans = html_to_spans(LD_FIXTURE)
    _, photos = parse_offer_spans(spans)
    assert photos == ["https://img.x.pl/1/0.jpg", "https://img.x.pl/1/1.jpg"]
    img_spans = [s for s in spans if s["kind"] == "image"]
    assert img_spans[0]["offset"] == 0


def test_merge_precedence_ld_over_nextdata_over_css():
    # M31: LD+JSON > __NEXT_DATA__ > CSS fallback, first-wins per field
    html = """
<script type="application/ld+json">
{"@type":"Product","offers":{"@type":"Offer","price":111}}
</script>
<script id="__NEXT_DATA__" type="application/json">
{"props":{"pageProps":{"ad":{"params":[["price_amount","222"],["rooms","4"]],"images":[]}}}}
</script>
<div class="param" data-field="price_amount">333</div>
<div class="param" data-field="city">Gdansk</div>
"""
    spans = html_to_spans(html)
    fields = {s["text"].partition("=")[0]: s["text"].partition("=")[2]
              for s in spans if s["kind"] == "text"}
    assert float(fields["price_amount"]) == 111          # LD wins
    assert fields["rooms"] == "4"                        # NEXT fills gap
    assert fields["city"] == "Gdansk"                    # CSS fills gap


def test_leaflet_geo_fallback():
    # M17 (morizon.py:209-243): geo recovered from L.marker when LD/NEXT
    # carry no coordinates
    html = """
<div class="param" data-field="city">Gdansk</div>
<script>var map=L.map("m");L.marker([54.401, 18.57]).addTo(map);</script>
"""
    fields = {s["text"].partition("=")[0]: s["text"].partition("=")[2]
              for s in html_to_spans(html) if s["kind"] == "text"}
    assert float(fields["lat"]) == 54.401
    assert float(fields["lon"]) == 18.57


def test_srcset_argmax():
    # M26 (morizon.py:744-759): argmax by width
    assert best_from_srcset(
        "u?w=320 320w, u 1280w, u?w=640 640w") == "u"
    assert best_from_srcset("a 10w") == "a"
    assert best_from_srcset("nonsense") is None
    html = ('<img class="gallery" srcset="https://i/x?w=320 320w, '
            'https://i/x 1280w"/>')
    spans = html_to_spans(html)
    assert [s["media_ref"] for s in spans if s["kind"] == "image"] == ["https://i/x"]


def test_malformed_ld_block_skipped():
    html = """
<script type="application/ld+json">{not valid json</script>
<div class="param" data-field="rooms">2</div>
"""
    fields = {s["text"].partition("=")[0]: s["text"].partition("=")[2]
              for s in html_to_spans(html) if s["kind"] == "text"}
    assert fields == {"rooms": "2"}


def test_unterminated_script_blocks_ignored():
    # find-based block slicing must treat a missing </script> exactly
    # like the DOTALL regex it replaced: no match, chain falls through
    html = ('<script type="application/ld+json">{"@type":"Product","name":"X"'
            '<div class="param" data-field="rooms">3</div>')
    fields = {s["text"].partition("=")[0]: s["text"].partition("=")[2]
              for s in html_to_spans(html) if s["kind"] == "text"}
    assert fields == {"rooms": "3"}
    html2 = '<script id="__NEXT_DATA__" type="application/json">{"props":{}}'
    assert html_to_spans(html2) == []


def test_multiple_ld_blocks_first_wins():
    html = (
        '<script type="application/ld+json">'
        '{"@type":"Product","name":"first"}</script>'
        '<script type="application/ld+json">'
        '{"@type":"Product","name":"second","numberOfRooms":4}</script>')
    fields = {s["text"].partition("=")[0]: s["text"].partition("=")[2]
              for s in html_to_spans(html) if s["kind"] == "text"}
    assert fields["title"] == "first"     # first product wins per field
    assert fields["rooms"] == "4"         # later block fills missing fields


def test_stray_marker_outside_script_does_not_derail_extraction():
    """The marker substring appearing in visible text, in an earlier
    script's JSON body, or with no preceding <script at all must not
    abort or mis-anchor extraction of genuine later blocks."""
    prefix = (
        '<p>uses application/ld+json markup</p>\n'
        '<script>var cfg = {"fmt": "application/ld+json"};</script>\n'
        '<div data-note="application/ld+json"></div>\n')
    fields, images = extract_ldjson_fields(
        "<html><head>" + prefix + LD_FIXTURE)
    assert fields["title"] == "Mieszkanie 3 pok. Gdansk"
    assert float(fields["price_amount"]) == 499000.0
    assert len(images) == 2
    # marker before ANY <script in the document (old code returned)
    fields2, _ = extract_ldjson_fields(
        "<html><body><p>application/ld+json here</p>" + LD_FIXTURE)
    assert fields2["title"] == "Mieszkanie 3 pok. Gdansk"


def test_empty_href_cards_degrade_gracefully():
    html = ('<article data-cy="listing-item">'
            '<a data-cy="listing-item-link" href="">x</a></article>'
            '<article data-cy="listing-item">'
            '<a data-cy="listing-item-link" '
            'href="https://x.otodom.pl/pl/oferta/m-1-ID1">y</a></article>')
    links = extract_listing_links(html)
    assert links == ["https://x.otodom.pl/pl/oferta/m-1-ID1"]
    from realestate_scraper_ray.stages.portals import listing_links_generic
    assert listing_links_generic(html, "https://x.otodom.pl") == [
        "https://x.otodom.pl/pl/oferta/m-1-ID1"]
