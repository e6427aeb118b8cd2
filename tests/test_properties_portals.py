"""Property-based tests (hypothesis) for the per-portal extraction
kernels: the tolerant DOM and the dialect round-trips must hold for
ARBITRARY well-formed-ish inputs, not just the synthetic portal's."""

from hypothesis import given, settings
from hypothesis import strategies as st

from realestate_scraper_ray.stages.htmlparse import parse_html
from realestate_scraper_ray.stages.portals import (
    advert_to_fields,
    fields_to_advert,
    hydrated_center,
    listing_links_generic,
    listing_links_morizon,
    listing_links_otodom,
)

_ident = st.text(alphabet=st.sampled_from("abcdefgh0123456789-"),
                 min_size=1, max_size=12)


@st.composite
def otodom_cards(draw):
    """(href, serialized card) with random attribute order and quoting."""
    slug = draw(_ident)
    oid = draw(st.integers(1, 10**9))
    href = f"/pl/oferta/{slug}-ID{oid}"
    quote = draw(st.sampled_from(['"', "'", ""]))
    attrs = [f"href={quote}{href}{quote}",
             f"data-cy={quote}listing-item-link{quote}"]
    if draw(st.booleans()):
        attrs.append(f'class={quote}css-{draw(_ident)}{quote}')
    if draw(st.booleans()):
        attrs.reverse()
    a = "<a " + " ".join(attrs) + ">oferta</a>"
    wrap = draw(st.sampled_from(
        ["{a}", '<article data-sentry-element="Container">{a}</article>',
         "<article>{a}</article>", "<div><span>x</span>{a}"]))
    return href, wrap.format(a=a)


@settings(max_examples=60, deadline=None)
@given(st.lists(otodom_cards(), min_size=1, max_size=8))
def test_otodom_extraction_order_and_tolerance(cards):
    html = "<html><body><p>noise</p>" + "\n".join(c for _, c in cards) + "</body></html>"
    got = listing_links_otodom(html, "https://www.otodom.pl")
    assert got == ["https://www.otodom.pl" + h for h, _ in cards]
    # the generic extractor agrees (same data-cy markers present)
    got_g = listing_links_generic(html, "https://www.otodom.pl")
    assert got_g == got


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_ident, st.integers(10**6, 10**10),
                          st.booleans()), min_size=1, max_size=8))
def test_morizon_extraction_dedups_by_id_keeps_order(items):
    html, expect, seen = [], [], set()
    for slug, mzn, relative in items:
        href = f"/oferta/{slug}-mzn{mzn}"
        full = f"https://x.morizon.pl{href}"
        html.append(f'<a href="{href if relative else full}">m</a>')
        if mzn not in seen:
            seen.add(mzn)
            expect.append(full)
    got = listing_links_morizon("\n".join(html), "https://x.morizon.pl")
    assert got == expect


_field_val = st.text(alphabet=st.sampled_from(
    "abcdefghijklmnopqrstuvwxyz0123456789 .,-ółżź"), min_size=1, max_size=24)
_FIELD_POOL = ("offer_id", "source", "title", "price_amount",
               "price_currency", "price_per_m2", "city", "district",
               "street", "area_m2", "rooms", "floor", "floors",
               "market_type", "property_type", "posted_at", "updated_at",
               "description", "inquiry")


@st.composite
def field_dicts(draw):
    keys = draw(st.lists(st.sampled_from(_FIELD_POOL), unique=True,
                         min_size=1, max_size=len(_FIELD_POOL)))
    fields = {k: draw(_field_val) for k in keys}
    # lat/lon travel as coordinates: both-or-neither, float-repr strings
    if draw(st.booleans()):
        fields["lat"] = str(draw(st.floats(49.0, 54.875, allow_nan=False)))
        fields["lon"] = str(draw(st.floats(14.0, 24.5, allow_nan=False)))
    return fields


@settings(max_examples=80, deadline=None)
@given(field_dicts(),
       st.lists(st.text(alphabet=st.sampled_from("abc0/:."),
                        min_size=1, max_size=16), max_size=4))
def test_advert_roundtrip_is_exact(fields, images):
    got_fields, got_images = advert_to_fields(fields_to_advert(fields, images))
    assert got_fields == fields
    assert got_images == images


@settings(max_examples=60, deadline=None)
@given(st.floats(10.0, 90.0, allow_nan=False),
       st.floats(10.0, 90.0, allow_nan=False))
def test_hydrated_center_recovers_equal_corners(lat, lon):
    la, lo = str(float(lat)), str(float(lon))
    html = ('<script>x=[{"latitude":101,"longitude":102},'
            f"{la},{lo},"
            '{"latitude":103,"longitude":104},'
            f"{la},{lo}]</script>")
    got = hydrated_center(html)
    assert got == (la, lo)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.sampled_from("<>ab c=\"'/!-"), max_size=80))
def test_tolerant_parser_never_raises(junk):
    root = parse_html(junk)          # arbitrary garbage: no exception
    for n in root.iter_nodes():
        assert n.tag


def test_hydrated_gate_accepts_any_marker_id():
    """The cheap substring gate in html_to_spans must fire for ANY
    hydrated-bounds marker id, not just the synthetic portal's 101..104
    — a real morizon page may number its corner markers arbitrarily."""
    from realestate_scraper_ray.stages.fetch import html_to_spans
    html = ('<html><body><script>x=[{"latitude":7,"longitude":8},'
            "54.10,18.20,"
            '{"latitude":9,"longitude":3},'
            "54.30,18.40]</script>"
            '<div class="param" data-k="offer_id">m1</div></body></html>')
    spans = html_to_spans(html, "https://www.morizon.pl/oferta/mzn1")
    fields = {s["text"].split("=", 1)[0]: s["text"].split("=", 1)[1]
              for s in spans if "=" in s.get("text", "")}
    assert float(fields["lat"]) == (54.10 + 54.30) / 2
    assert float(fields["lon"]) == (18.20 + 18.40) / 2
