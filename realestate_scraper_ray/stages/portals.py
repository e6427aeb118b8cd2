"""Per-portal markup extraction — the reference's adapter selectors
re-expressed as a two-tier fast-regex / tolerant-DOM chain.

Each real portal serves its own markup dialect; the reference has one
adapter per portal. This module carries the portal-specific extraction
rules (citations into /root/reference/scrapper/adapters/):

  - otodom: ``a[data-cy=listing-item-link]`` cards +
    ``article[data-sentry-element=Container]`` investment cards with the
    ``aside[class*=evkld750]`` badge — only completed ("Ukończona")
    investments are entered (otodom.py:497-604); raw-href regex fallback
    ``/pl/oferta/…`` / ``/pl/inwestycja/…`` (otodom.py:409-430)
  - gratka: ``article`` cards → ``a[href*='/ob/']`` with the
    ``/ob/\\d+`` id check, per-card location text filtered by
    normalized city containment, all-/ob/ fallback when nothing passes,
    dedup by id (gratka.py:618-665); ``div[data-cy=propertyNumber]``
    offer-id (gratka.py:613-616)
  - morizon: raw ``href=…mzn\\d+`` regex (absolute or relative),
    dedup by ``mzn\\d+`` id (morizon.py:31-35, 95-113); hydrated
    map-bounds center as the geo fallback (morizon.py:26-29, 115-140)
  - trojmiasto: ``__NEXT_DATA__`` ``advert`` (preferred) / ``ad`` object
    with the characteristics walk (``m`` → area, ``rooms_num`` → rooms,
    trojmiasto.py:283-330)

Fast paths are attribute-order- and quote-insensitive regexes (the
markup-level tolerance BeautifulSoup provides the reference); when a
fast path finds nothing but the portal's markers are present, the
tolerant DOM (stages/htmlparse.py) re-parses the document — the same
two-tier shape as the reference's soup-pass + raw-regex union.
"""

from __future__ import annotations

import re

from ..functions.cities import city_key
from ..functions.urls import normalize_url, slugify
from .htmlparse import parse_html

OTODOM_BASE = "https://www.otodom.pl"

# href patterns (otodom.py:24-26, morizon.py:31-35, gratka.py:628-636)
OTODOM_OFFER_RE = re.compile(r"/pl/oferta/[^\"'#?\s>]+")
OTODOM_INVEST_RE = re.compile(r"/pl/inwestycja/[^\"'#?\s>]+")
GRATKA_OB_RE = re.compile(r"/ob/(\d+)(?:[/?]|$)")
MZN_ID_RE = re.compile(r"(mzn\d{4,})")

# one anchor-scan regex: quote-insensitive href capture in doc order
_HREF_RE = re.compile(
    r"<a\b[^>]*?href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I)
# div[data-cy=propertyNumber] → "gratka-23610653" (gratka.py:613-616)
_PROPNUM_RE = re.compile(
    r"data-cy\s*=\s*[\"']?propertyNumber[\"']?[^>]*>\s*(?:gratka-)?([^<\s]+)",
    re.I)
# morizon hydrated map bounds: two {latitude:ID,longitude:ID} corner
# markers each followed by the corner coordinates (morizon.py:26-29)
HYDRATED_BOUNDS_RE = re.compile(
    r'\{"latitude":\d+,"longitude":\d+\}\s*,\s*(?P<lat1>\d{2}\.\d+)\s*,\s*'
    r'(?P<lon1>\d{2}\.\d+)\s*,\s*'
    r'\{"latitude":\d+,"longitude":\d+\}\s*,\s*(?P<lat2>\d{2}\.\d+)\s*,\s*'
    r'(?P<lon2>\d{2}\.\d+)')


def join_url(base: str, href: str) -> str:
    """Absolutize ``href`` against ``base`` (scheme://host), the
    reference's ``join_url`` (core/http.py)."""
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("//"):
        return "https:" + href
    if not href.startswith("/"):
        href = "/" + href
    return base + href


def base_of(url: str) -> str:
    """scheme://host of a page URL — the join base for relative hrefs."""
    i = url.find("/", url.find("//") + 2)
    return url if i < 0 else url[:i]


def _hrefs_in(fragment: str) -> list[str]:
    """All anchor hrefs in ``fragment``, document order, any quoting."""
    out = []
    for m in _HREF_RE.finditer(fragment):
        h = m.group(1) or m.group(2) or m.group(3)
        if h:
            out.append(h)
    return out


def _iter_article_segments(html: str):
    """Yield ``(outside_fragment, card_fragment)`` pairs walking the
    document: text between cards (pagination anchors live there) and
    each ``<article>…</article>`` card. Find-loop, no DOM build."""
    pos, n = 0, len(html)
    while True:
        i = html.find("<article", pos)
        yield html[pos:i if i >= 0 else n], None
        if i < 0:
            return
        j = html.find("</article>", i)
        j = j + 10 if j >= 0 else n
        yield None, html[i:j]
        pos = j


def city_matches(text: str, city: str) -> bool:
    """Scalar M29 containment (gratka.py:89-93 ``_city_in_text``):
    normalized city key appears in the slug-normalized text."""
    return city_key(city) in slugify(text)


# ---------------------------------------------------------------------------
# crawl-path listing extraction (doc order, portal rules applied)
# ---------------------------------------------------------------------------


def listing_links_otodom(html: str, base: str) -> list[str]:
    """Otodom/investment listing walk (otodom.py:497-604): card anchors
    in document order; investment cards (``aside[class*=evkld750]``)
    are entered only when the card says "Ukończona" (completed);
    non-portal hrefs are dropped at the pattern level."""
    out: list[str] = []
    for outside, card in _iter_article_segments(html):
        frag = outside if card is None else card
        if not frag:
            continue
        if card is not None and "evkld750" in card and "Ukończona" not in card:
            continue  # in-progress investment: skip the whole card
        for h in _hrefs_in(frag):
            if (OTODOM_OFFER_RE.search(h) or OTODOM_INVEST_RE.search(h)
                    or "/pl/wyniki/" in h):
                out.append(join_url(base, h))
    return out


def listing_links_gratka(html: str, base: str, city: str) -> list[str]:
    """Gratka card walk (gratka.py:618-665): per-card ``/ob/\\d+`` link
    + location text filtered by normalized city containment; pagination
    anchors (outside cards) pass through; fallback to every ``/ob/``
    href when no card survives the filter; dedup by id keep-first."""
    kept: list[str] = []
    all_ob: list[str] = []
    for outside, card in _iter_article_segments(html):
        if card is None:
            if outside:
                for h in _hrefs_in(outside):
                    if "?page=" in h and "/ob/" not in h:
                        kept.append(join_url(base, h))  # pagination
            continue
        loc_txt = None  # tag-strip the card once, not once per href
        for h in _hrefs_in(card):
            u = join_url(base, h)
            if not GRATKA_OB_RE.search(u):
                continue
            all_ob.append(u)
            # location text: strip tags from the card, containment check
            if loc_txt is None:
                loc_txt = re.sub(r"<[^>]+>", " ", card)
            if city_matches(loc_txt, city):
                kept.append(u)
    if not [u for u in kept if "/ob/" in u] and all_ob:
        # city filter matched nothing → fall back to every /ob/ link
        # (gratka.py:648-655)
        pag = [u for u in kept if "/ob/" not in u]
        kept = all_ob + pag
    # dedup by offer id, keep-first (gratka.py:657-665)
    out, seen = [], set()
    for u in kept:
        m = GRATKA_OB_RE.search(u)
        key = m.group(1) if m else u
        if key not in seen:
            seen.add(key)
            out.append(u)
    return out


def listing_links_morizon(html: str, base: str) -> list[str]:
    """Morizon raw-href walk (morizon.py:31-35, 95-113): any href
    carrying an ``mzn\\d+`` id (absolute or relative), plus pagination
    hrefs; normalize, dedup by id keep-first."""
    out, seen = [], set()
    for h in _hrefs_in(html):
        u = join_url(base, h)
        m = MZN_ID_RE.search(u)
        if m:
            if m.group(1) not in seen:
                seen.add(m.group(1))
                out.append(u)
        elif "?page=" in u:
            out.append(u)  # pagination
    return out


_CARD_ANY_RE = re.compile(
    r"<a\b(?=[^>]*data-cy\s*=\s*[\"']?listing-item-link)[^>]*?"
    r"href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I)
_PAGNEXT_ANY_RE = re.compile(
    r"<a\b(?=[^>]*class\s*=\s*[\"']?pagination-next)[^>]*?"
    r"href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I)


def listing_links_generic(html: str, base: str) -> list[str]:
    """Generic data-cy card dialect (trojmiasto + extension sources):
    attribute-order/quote-insensitive card regex, then pagination-next;
    tolerant-DOM fallback when markers exist but the regex missed
    (mangled attribute quoting the tokenizer still understands)."""
    links: list[str] = []
    if 'listing-item-link' in html:
        for m in _CARD_ANY_RE.finditer(html):
            h = m.group(1) or m.group(2) or m.group(3)
            if h:  # empty-href anchors degrade, not crash
                links.append(join_url(base, h))
        if not links:  # markers present, fast path missed → DOM pass
            root = parse_html(html)
            for a in root.find_all("a", attrs={"data-cy": "listing-item-link"}):
                h = a.get("href")
                if h:
                    links.append(join_url(base, h))
    for m in _PAGNEXT_ANY_RE.finditer(html):
        h = m.group(1) or m.group(2) or m.group(3)
        if h:
            links.append(join_url(base, h))
    return links


# ---------------------------------------------------------------------------
# offer-page helpers
# ---------------------------------------------------------------------------

# trojmiasto __NEXT_DATA__ characteristics walk (trojmiasto.py:283-330):
# structured advert keys ↔ the engine's field names
_CHAR_TO_FIELD = {
    "m": "area_m2", "rooms_num": "rooms", "floor_no": "floor",
    "building_floors_num": "floors", "market": "market_type",
    "estate_type": "property_type", "price_per_m2": "price_per_m2",
}
FIELD_TO_CHAR = {v: k for k, v in _CHAR_TO_FIELD.items()}


def advert_to_fields(adv: dict) -> tuple[dict[str, str], list[str]]:
    """Walk a ``props.pageProps.advert`` object (the trojmiasto/otodom
    "modern page" state, trojmiasto.py:283-330): title, createdAt /
    refreshedAt, price {value,currency}, location {coordinates, city,
    district, street}, characteristics list, images."""
    fields: dict[str, str] = {}
    if adv.get("id") is not None:
        fields["offer_id"] = str(adv["id"])
    if adv.get("title") is not None:
        fields["title"] = str(adv["title"])
    price = adv.get("price") or {}
    if isinstance(price, dict):
        if price.get("value") is not None:
            fields["price_amount"] = str(price["value"])
        if price.get("currency") is not None:
            fields["price_currency"] = str(price["currency"])
    loc = adv.get("location") or {}
    if isinstance(loc, dict):
        coords = loc.get("coordinates") or {}
        if isinstance(coords, dict):
            if coords.get("latitude") is not None:
                fields["lat"] = str(coords["latitude"])
            if coords.get("longitude") is not None:
                fields["lon"] = str(coords["longitude"])
        for key, fname in (("city", "city"), ("district", "district"),
                           ("street", "street")):
            v = loc.get(key)
            if isinstance(v, dict) and v.get("name") is not None:
                fields[fname] = str(v["name"])
    for item in adv.get("characteristics") or []:
        if not isinstance(item, dict):
            continue
        k, v = item.get("key"), item.get("value")
        if k is None or v is None:
            continue
        fields.setdefault(_CHAR_TO_FIELD.get(k, k), str(v))
    for src_key, fname in (("createdAt", "posted_at"),
                           ("refreshedAt", "updated_at"),
                           ("description", "description")):
        if adv.get(src_key) is not None:
            fields.setdefault(fname, str(adv[src_key]))
    images = [str(u) for u in (adv.get("images") or [])]
    return fields, images


def fields_to_advert(fields: dict[str, str], images: list[str]) -> dict:
    """Inverse of :func:`advert_to_fields` — used by the synthetic
    portal's trojmiasto renderer so the dialect is exactly invertible."""
    adv: dict = {}
    if "offer_id" in fields:
        adv["id"] = fields["offer_id"]
    if "title" in fields:
        adv["title"] = fields["title"]
    price: dict = {}
    if "price_amount" in fields:
        price["value"] = fields["price_amount"]
    if "price_currency" in fields:
        price["currency"] = fields["price_currency"]
    if price:
        adv["price"] = price
    loc: dict = {}
    if "lat" in fields:
        loc["coordinates"] = {"latitude": float(fields["lat"]),
                              "longitude": float(fields["lon"])}
    for fname in ("city", "district", "street"):
        if fname in fields:
            loc[fname] = {"name": fields[fname]}
    if loc:
        adv["location"] = loc
    chars = []
    handled = {"offer_id", "title", "price_amount", "price_currency",
               "lat", "lon", "city", "district", "street",
               "posted_at", "updated_at", "description"}
    for k, v in fields.items():
        if k in handled:
            continue
        chars.append({"key": FIELD_TO_CHAR.get(k, k), "value": v})
    if chars:
        adv["characteristics"] = chars
    if "posted_at" in fields:
        adv["createdAt"] = fields["posted_at"]
    if "updated_at" in fields:
        adv["refreshedAt"] = fields["updated_at"]
    if "description" in fields:
        adv["description"] = fields["description"]
    if images:
        adv["images"] = images
    return adv


def property_number(html: str) -> str | None:
    """``div[data-cy=propertyNumber]`` offer id, ``gratka-`` prefix
    stripped (gratka.py:613-616)."""
    m = _PROPNUM_RE.search(html)
    return m.group(1) if m else None


def hydrated_center(html: str) -> tuple[str, str] | None:
    """Center of the hydrated map bounds (morizon.py:115-140): NE/SW
    corner average, stringified for the field chain."""
    m = HYDRATED_BOUNDS_RE.search(html)
    if not m:
        return None
    lat = (float(m.group("lat1")) + float(m.group("lat2"))) / 2.0
    lon = (float(m.group("lon1")) + float(m.group("lon2"))) / 2.0
    return str(lat), str(lon)


# ---------------------------------------------------------------------------
# reference-parity surfaces (exercised by the reference's own fixtures,
# scrapper/tests/test_otodom_selectors.py)
# ---------------------------------------------------------------------------


def extract_offer_links(html: str, base: str = OTODOM_BASE) -> list[str]:
    """The reference's ``_extract_offer_links`` (otodom.py:409-430):
    tolerant-DOM anchor pass matching the offer/investment href
    patterns, THEN a raw-regex union over the document (data-href /
    shadow-DOM survivors), normalized + deduped keep-first."""
    hrefs: list[str] = []
    root = parse_html(html)
    for a in root.find_all("a"):
        h = a.get("href") or ""
        if OTODOM_OFFER_RE.search(h) or OTODOM_INVEST_RE.search(h):
            hrefs.append(h)
    hrefs += OTODOM_OFFER_RE.findall(html)
    hrefs += OTODOM_INVEST_RE.findall(html)
    out, seen = [], set()
    for h in hrefs:
        full = normalize_url(join_url(base, h))
        if full not in seen:
            seen.add(full)
            out.append(full)
    return out


def parse_ld_json_offer(html: str) -> dict:
    """The reference's ``_parse_ld_json_offer`` (otodom.py:220-313):
    LD+JSON Product/Offer walk returning typed fields — price as float,
    currency upper-cased, geo floats, ``photos_from_json`` list."""
    from ..functions.urls import coerce_float
    from .fetch import extract_ldjson_fields
    fields, images = extract_ldjson_fields(html)
    out: dict = {}
    if "title" in fields:
        out["title"] = fields["title"]
    if "price_amount" in fields:
        out["price_amount"] = coerce_float(fields["price_amount"])
    if "price_currency" in fields:
        out["price_currency"] = fields["price_currency"].upper()
    if "city" in fields:
        out["city"] = fields["city"]
    if "street" in fields:
        out["street"] = fields["street"]
    if "lat" in fields:
        out["lat"] = float(fields["lat"])
    if "lon" in fields:
        out["lon"] = float(fields["lon"])
    if "area_m2" in fields:
        out["area_m2"] = coerce_float(fields["area_m2"])
    if "rooms" in fields:
        out["rooms"] = int(float(fields["rooms"]))
    if images:
        out["photos_from_json"] = list(images)
    return out
