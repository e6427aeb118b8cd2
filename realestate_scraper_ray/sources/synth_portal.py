"""Deterministic synthetic portal — the crawl substrate (FIXTURES.md F1).

Every page is a *pure function* of its canonical URL + ``PortalConfig``:
``render(url) -> [span, ...]`` where a span is
``{kind: 'text'|'link'|'image', text, media_ref, offset}`` — the
interleaved text+media document shape from ``BASELINE.json.input_hint``.
Because rendering is procedural, the fetch stage needs no lookup table at
any scale; ``write_documents`` materializes the same pages as a parquet
``(doc_id, spans)`` table when a table-backed fetcher or span-equality
test needs one.

Page topology mirrors the reference's portals (citations into
``/root/reference/``):
  - listing pages with ``page_size`` offer links + a next-page link
    (otodom ``limit=72&page=N``, otodom.py:491)
  - per-page overlap re-links (exercises the URL-seen set, dedup.py:16-27)
  - tail pages with only already-seen offers → the "no_new twice" stop
    (morizon.py:697-709) — or an empty page → "no_links" stop
    (morizon.py:681-685)
  - otodom investment pages expanded depth-first with internal
    pagination (otodom.py:539-604)
  - inquiry-price offers with no price spans (morizon.py:314-319)
  - missing-geo offers that fail REQ_FIELDS (detail.py:21)
  - robots-disallowed '/private/...' links (north_rule adds robots
    handling, absent in the reference)
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PortalConfig
from ..schemas import DOCUMENTS

# ---------------------------------------------------------------------------
# stable hashing (process-independent, seeded)
# ---------------------------------------------------------------------------


def _h64(seed: int, *key: object) -> int:
    b = hashlib.sha1(("%d|" % seed + "|".join(map(str, key))).encode()).digest()
    return int.from_bytes(b[:8], "big")


def _unit(seed: int, *key: object) -> float:
    return _h64(seed, *key) / 2.0**64


# offer-field names emitted as text spans (subset of the reference Offer
# model, validate.py:9-50, that feeds the 11-column OFFER_SCHEMA)
TEXT_FIELDS = (
    "offer_id", "source", "title", "price_amount", "price_currency",
    "price_per_m2", "city", "lat", "lon", "area_m2", "rooms", "posted_at",
)


def span(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# Source names in URLs are matched generically ([a-z]+) and validated
# against cfg.sources in classify() — this is the §2.10 extension
# surface: a NEW source plugs in by adding its name to
# PortalConfig.sources plus one (name, page_size, weight, no_new_stop)
# record in PortalConfig.extra_sources (serialized with the job to every
# Ray worker), and the generic URL scheme (listing /mieszkania?page=N,
# offer …-ogl<oid>) plus the engine's generic parse chain pick it up
# with zero engine changes — the rebuild's analogue of the reference's
# BaseAdapter protocol (scrapper/adapters/base.py:19-46).
_LISTING_RE = re.compile(
    r"^https://(?:(?P<tm>ogloszenia\.trojmiasto\.pl)"
    r"|(?P<region>[a-z-]+)\.(?P<source>[a-z]+)\.pl)"
    r"(?:/pl/wyniki/sprzedaz/mieszkanie/[a-z-]+|/nieruchomosci/(?P<tmr>[a-z-]+)|/mieszkania)"
    r"\?(?:limit=\d+&)?(?:page|strona)=(?P<page>\d+)(?:&days=(?P<days>\d+))?$"
)
_OFFER_RE = re.compile(
    r"^https://(?:[a-z-]+\.[a-z]+\.pl|ogloszenia\.trojmiasto\.pl)"
    r"(?P<private>/private)?/(?:pl/oferta|oferta|nieruchomosci)/mieszkanie-"
    r"(?P<region>[a-z-]+)-(?P<k>\d+)(?:-ID|-mzn|-ogl|/ob/)(?P<oid>\d+)$"
)
_PHOTO_RE = re.compile(
    r"^https://img\.(?P<source>[a-z]+)\.pl/(?P<oid>\d+)/(?P<seq>\d+)\.jpg$")
_INVEST_RE = re.compile(
    r"^https://(?P<region>[a-z-]+)\.otodom\.pl/pl/inwestycja/osiedle-"
    r"(?P<k>\d+)-ID(?P<oid>\d+)"
    r"(?:\?page=(?P<page>\d+)(?:&sid=[0-9a-f]{8})*)?$"
)

_SITEMAP_RE = re.compile(
    r"^https://(?P<host>[a-z.-]+)/sitemap-(?P<region>[a-z-]+)"
    r"(?:-(?P<idx>\d+))?\.xml$"
)

INVEST_UNIT_BASE = 5_000_000  # unit offers live in a disjoint k-space
TRAP_K_BASE = 8_000_000       # trap chains live in a disjoint k-space


@dataclass(frozen=True)
class PageRef:
    kind: str          # listing | offer | investment | blocked | void
    source: str = ""
    region: str = ""
    page: int = 0
    k: int = 0
    oid: str = ""
    # listing pages only: the recency pushdown parameter (&days=N) — the
    # reference's last-days filter baked into the listing URL
    # (morizon.py:652-659 ps[date_from]; gratka.py:750-758)
    days: int | None = None


# The portal's fixed "today" — the anchor for posted_at stamps and the
# last-days recency filter (deterministic stand-in for date.today(),
# morizon.py:656).
PORTAL_TODAY = "2026-02-01"
PORTAL_TODAY_ORD = 739648  # datetime.date(2026, 2, 1).toordinal()


class Portal:
    def __init__(self, cfg: PortalConfig | None = None):
        self.cfg = cfg or PortalConfig()

    # -- URL grammar --------------------------------------------------------

    def host(self, source: str, region: str) -> str:
        if source == "trojmiasto":
            return "ogloszenia.trojmiasto.pl"
        return f"{region}.{source}.pl"

    def listing_url(self, source: str, region: str, page: int,
                    last_days: int | None = None) -> str:
        h = self.host(source, region)
        d = f"&days={last_days}" if last_days is not None else ""
        if source == "otodom":
            return (f"https://{h}/pl/wyniki/sprzedaz/mieszkanie/{region}"
                    f"?limit=72&page={page}{d}")
        if source == "trojmiasto":
            return f"https://{h}/nieruchomosci/{region}?strona={page}{d}"
        return f"https://{h}/mieszkania?page={page}{d}"

    def oid(self, source: str, region: str, k: int) -> str:
        si = self.cfg.sources.index(source) + 1
        ri = self.cfg.regions.index(region)
        return f"{si}{ri:02d}{k:07d}"

    def offer_url(self, source: str, region: str, k: int, private: bool = False) -> str:
        h = self.host(source, region)
        oid = self.oid(source, region, k)
        p = "/private" if private else ""
        if source == "otodom":
            return f"https://{h}{p}/pl/oferta/mieszkanie-{region}-{k}-ID{oid}"
        if source == "morizon":
            return f"https://{h}{p}/oferta/mieszkanie-{region}-{k}-mzn{oid}"
        if source == "gratka":
            return f"https://{h}{p}/nieruchomosci/mieszkanie-{region}-{k}/ob/{oid}"
        return f"https://{h}{p}/nieruchomosci/mieszkanie-{region}-{k}-ogl{oid}"

    def investment_url(self, region: str, k: int, page: int = 1) -> str:
        oid = "9" + self.oid("otodom", region, k)
        base = f"https://{region}.otodom.pl/pl/inwestycja/osiedle-{k}-ID{oid}"
        return base if page == 1 else f"{base}?page={page}"

    def trap_url(self, region: str, k: int, page: int = 1) -> str:
        """A session-id trap hop: indistinguishable from an investment
        URL by grammar (classify() → 'investment'), but page p carries
        p-1 accumulated &sid= params — every hop is a brand-new URL of
        growing length, the shape the frontier guard keys on."""
        u = self.investment_url(region, k, page)
        sids = "".join(
            f"&sid={_h64(self.cfg.seed, 'sid', region, k, i) % (1 << 32):08x}"
            for i in range(1, page))
        return u + sids

    def classify(self, url: str) -> PageRef:
        m = _OFFER_RE.match(url)
        if m:
            kind = "blocked" if m.group("private") else "offer"
            oid = m.group("oid")
            si = int(oid[0]) - 1
            if 0 <= si < len(self.cfg.sources):
                return PageRef(kind, self.cfg.sources[si], m.group("region"),
                               0, int(m.group("k")), oid)
            return PageRef("void")
        m = _INVEST_RE.match(url)
        if m:
            return PageRef("investment", "otodom", m.group("region"),
                           int(m.group("page") or 1), int(m.group("k")), m.group("oid"))
        m = _LISTING_RE.match(url)
        if m:
            days = int(m.group("days")) if m.group("days") else None
            if m.group("tm"):
                return PageRef("listing", "trojmiasto", m.group("tmr"),
                               int(m.group("page")), days=days)
            if m.group("source") not in self.cfg.sources:
                return PageRef("void")
            return PageRef("listing", m.group("source"), m.group("region"),
                           int(m.group("page")), days=days)
        return PageRef("void")

    # -- topology -----------------------------------------------------------

    def page_size(self, source: str) -> int:
        return max(3, int(self.cfg.source_page_size(source)
                          * self.cfg.page_size_scale))

    def content_pages(self, source: str, region: str) -> int:
        c = self.cfg
        w = self.cfg.source_weight(source)
        u = _unit(c.seed, "npages", source, region)
        return max(2, int(round(c.base_pages * w * (0.7 + 0.6 * u))))

    def tail_mode(self, source: str, region: str) -> str:
        """'no_new' → cp is followed by ≥2 all-repeat pages; 'no_links' →
        page cp+1 is empty."""
        return "no_new" if _h64(self.cfg.seed, "tail", source, region) % 2 == 0 else "no_links"

    def seeds(self, last_days: int | None = None) -> list[dict]:
        return [
            {"url": self.listing_url(s, r, 1, last_days), "source": s, "region": r,
             "kind": "pagination", "priority": 0, "page_idx": 0, "pos": 0}
            for s in self.cfg.sources
            for r in self.cfg.regions
        ]

    def robots_txt(self, host: str) -> str:
        txt = "User-agent: *\nDisallow: /private\n"
        if self.cfg.robots_crawl_delay is not None:
            txt += f"Crawl-delay: {self.cfg.robots_crawl_delay}\n"
        # RFC 9309 §2.3 Sitemap directive (group-independent): each
        # host advertises its region sitemap indexes — trojmiasto's
        # shared host lists one per region
        for s in self.cfg.sources:
            for r in self.cfg.regions:
                if self.host(s, r) == host:
                    txt += f"Sitemap: {self.sitemap_index_url(s, r)}\n"
        return txt

    def classify_sitemap_url(self, url: str) -> tuple[str, str] | None:
        """(source, region) of a sitemap index/chunk URL, else None."""
        m = _SITEMAP_RE.match(url)
        if not m:
            return None
        host, region = m.group("host"), m.group("region")
        source = ("trojmiasto" if host == "ogloszenia.trojmiasto.pl"
                  else host.split(".")[-2])
        if (source in self.cfg.sources and region in self.cfg.regions
                and self.host(source, region) == host):
            return source, region
        return None

    # -- sitemaps (two-level: per-host index -> chunked urlsets) ------------
    # Real portals expose their canonical detail pages through
    # sitemap.xml; the synthetic portal serves a standard
    # sitemaps.org index per (source, region) host whose chunks list
    # that region's PLAIN offer URLs (investment/trap/robots-private
    # link targets are deliberately absent — sitemaps are partial in
    # practice, which is what the coverage audit measures) with
    # <lastmod> = the offer's posted date.

    SITEMAP_CHUNK = 200

    def sitemap_index_url(self, source: str, region: str) -> str:
        return f"https://{self.host(source, region)}/sitemap-{region}.xml"

    def sitemap_chunk_url(self, source: str, region: str, i: int) -> str:
        return f"https://{self.host(source, region)}/sitemap-{region}-{i}.xml"

    def sitemap_direct_ks(self, source: str, region: str) -> list[int]:
        """The ks whose listing-card link is the plain public offer URL
        (the sitemap's membership rule)."""
        n = self.content_pages(source, region) * self.page_size(source)
        return [k for k in range(n)
                if self._link_target(source, region, k)
                == self.offer_url(source, region, k)]

    def render_sitemap(self, url: str) -> str | None:
        """Serve sitemap XML for an index or chunk URL; None otherwise."""
        m = _SITEMAP_RE.match(url)
        if not m:
            return None
        sr = self.classify_sitemap_url(url)
        if sr is None:
            return None
        source, region = sr
        idx = m.group("idx")
        ks = self.sitemap_direct_ks(source, region)
        n_chunks = max(1, -(-len(ks) // self.SITEMAP_CHUNK))
        ns = "http://www.sitemaps.org/schemas/sitemap/0.9"
        if idx is None:  # index document
            items = "\n".join(
                f"  <sitemap><loc>{self.sitemap_chunk_url(source, region, i)}"
                f"</loc></sitemap>" for i in range(n_chunks))
            return (f'<?xml version="1.0" encoding="UTF-8"?>\n'
                    f'<sitemapindex xmlns="{ns}">\n{items}\n</sitemapindex>')
        i = int(idx)
        if not 0 <= i < n_chunks:
            return None
        import datetime
        chunk = ks[i * self.SITEMAP_CHUNK:(i + 1) * self.SITEMAP_CHUNK]
        items = []
        for k in chunk:
            d = datetime.date.fromordinal(
                PORTAL_TODAY_ORD - self.posted_days_ago(source, region, k))
            items.append(
                f"  <url><loc>{self.offer_url(source, region, k)}</loc>"
                f"<lastmod>{d.isoformat()}</lastmod></url>")
        body = "\n".join(items)
        return (f'<?xml version="1.0" encoding="UTF-8"?>\n'
                f'<urlset xmlns="{ns}">\n{body}\n</urlset>')

    # -- per-offer facts ----------------------------------------------------

    def _bucket(self, tag: str, *key: object) -> int:
        return _h64(self.cfg.seed, tag, *key) % 1000

    def posted_days_ago(self, source: str, region: str, k: int) -> int:
        """Offer age in days relative to PORTAL_TODAY (0..44). Drives the
        posted_at stamp and the last-days listing filter (the reference's
        recency pushdown, morizon.py:652-659)."""
        return _h64(self.cfg.seed, "posted", self.oid(source, region, k)) % 45

    def _fmt_date(self, days_ago: int, polish: bool) -> str:
        import datetime
        d = datetime.date.fromordinal(PORTAL_TODAY_ORD - days_ago)
        if polish:
            return f"{d.day:02d}.{d.month:02d}.{d.year} 12:30"
        return f"{d.isoformat()}T12:30:00"

    def _dup_base(self, region: str, k: int, oid: str) -> str:
        """The shared fact key of a cross-source dup pair (the physical
        property); the page's own oid when it is not a dup member."""
        c = self.cfg
        spatial_dup = (_h64(c.seed, "spatialdup", region, k) % 1000
                       < c.spatial_dup_per_mille)
        return f"dupbase|{region}|{k}" if spatial_dup else oid

    def content_ver(self, source: str, region: str, k: int) -> int:
        """The content version of one offer page: 0 unless the version
        bump selected this page.  The change bucket keys on the dup
        BASE (the physical property), so every portal copy of a
        cross-source dup pair changes together — a version bump must
        never break the ≤30 m / ±90-price spatial-dup invariant the
        geo dedup stage verifies."""
        c = self.cfg
        if c.content_version <= 0:
            return 0
        base = self._dup_base(region, k, self.oid(source, region, k))
        if self._bucket("chg", base) < c.changed_per_mille:
            return c.content_version
        return 0

    def etag(self, url: str) -> str | None:
        """RFC 9110 entity tag for a detail page — a pure function of
        (seed, oid, content version), so a conditional fetch can answer
        not-modified WITHOUT rendering the body.  None for page kinds
        that are always re-fetched (listing/investment drive frontier
        expansion and change with every posting)."""
        ref = self.classify(url)
        if ref.kind not in ("offer", "blocked"):
            return None
        oid = self.oid(ref.source, ref.region, ref.k)
        ver = self.content_ver(ref.source, ref.region, ref.k)
        return f"{_h64(self.cfg.seed, 'etag', oid, ver):016x}"

    def offer_facts(self, source: str, region: str, k: int) -> dict:
        """Deterministic ground-truth fields for offer (source, region, k)."""
        c = self.cfg
        oid = self.oid(source, region, k)
        # content versioning: a bumped version re-rolls the FACT values
        # of the changed subset (page structure, posted date and the
        # spatial-dup pairing stay stable — a price edit does not move
        # a listing to a different page shape)
        sd = c.seed + self.content_ver(source, region, k) * 1_000_003
        u = lambda tag: _unit(sd, tag, oid)  # noqa: E731
        # cross-source near-duplicates: the same physical listing posted
        # on several portals with tiny price/coordinate drift — the case
        # the reference's backend spatial dup-check catches (50 m radius,
        # price ±100, backend.py:58-93). Decided WITHOUT the source in
        # the hash so all sources of (region, k) share the base facts.
        spatial_dup = (_h64(c.seed, "spatialdup", region, k) % 1000
                       < c.spatial_dup_per_mille)
        base = f"dupbase|{region}|{k}" if spatial_dup else oid
        ub = lambda tag: _unit(sd, tag, base)  # noqa: E731
        price = round(200_000 + ub("price") * 1_800_000, -3)
        true_area = round(20 + ub("area") * 130, 1)
        rooms = 1 + _h64(sd, "rooms", base) % 6
        lat = round(49.2 + ub("lat") * 5.5, 6)
        lon = round(14.2 + ub("lon") * 10.1, 6)
        if spatial_dup:  # per-source drift: ≤ ~30 m, price ≤ ±90
            price = price + round(u("dprice") * 180 - 90, 0)
            lat = round(lat + (u("dlat") - 0.5) * 0.0005, 6)
            lon = round(lon + (u("dlon") - 0.5) * 0.0005, 6)
        ppm2 = round(price / true_area, 2)
        n_photos = _h64(sd, "nph", oid) % (c.max_photos + 1)
        b = self._bucket("variant", oid)
        # wide-schema fields (reference OFFER_COLUMNS, storage.py:13-20)
        hb = lambda tag, n: _h64(sd, tag, base) % n  # noqa: E731
        districts = ("Centrum", "Wrzeszcz", "Mokotow", "Podgorze",
                     "Jezyce", "Srodmiescie", "Zaspa", "Oliwa")
        streets = ("Polna", "Lesna", "Dluga", "Krotka", "Sloneczna",
                   "Ogrodowa", "Lipowa", "Kwiatowa", "Szkolna", "Parkowa")
        floor = 250 if 500 <= b < 520 else hb("floor", 11)  # 0..10 (250 = M23 bucket)
        return {
            "district": districts[hb("district", len(districts))],
            # street optional ~20% of the time (reference fields optional)
            "street": (None if hb("street_opt", 10) < 2
                       else f"ul. {streets[hb('street', len(streets))]} {1 + hb('streetno', 120)}"),
            "floor": floor,
            "floors": floor + hb("floors_extra", 6),
            "market_type": "pierwotny" if hb("market", 10) < 3 else "wtorny",
            "property_type": "apartament" if hb("ptype", 10) < 2 else "mieszkanie",
            "posted_days_ago": self.posted_days_ago(source, region, k),
            "updated_days_ago": max(
                0, self.posted_days_ago(source, region, k) - _h64(sd, "upd", oid) % 5),
            "oid": oid,
            "spatial_dup": spatial_dup,
            "price": price,
            "true_area": true_area,
            "ppm2": ppm2,
            "rooms": rooms,
            "lat": lat,
            "lon": lon,
            "city": region.split("-")[0].capitalize(),
            "n_photos": n_photos,
            # variants (disjoint hash buckets):
            "inquiry": source == "morizon" and b < c.inquiry_per_mille,
            "missing_geo": c.inquiry_per_mille <= b < c.inquiry_per_mille + c.missing_geo_per_mille,
            # ppm2 omitted → engine derives it (M19, morizon.py:573-579)
            "omit_ppm2": 100 <= b < 180,
            # emitted area off by +20% → area-correction rule fires
            # (morizon.py:581-593: |area - price/ppm2| / (price/ppm2) > 0.08)
            "bad_area": 180 <= b < 240,
            # currency emitted lowercase → validator upper-cases
            # (validate.py:42-45)
            "lower_currency": 240 <= b < 300,
            # a duplicate photo URL in the gallery → keep-first dedup
            # (otodom.py:775-785)
            "dup_photo": n_photos >= 2 and 300 <= b < 380,
            # price/area/rooms served only as Polish prose in a
            # description span (M13/M14 free-text extraction surface);
            # band 380+ is disjoint from the structured-variant bands
            "prose": 380 <= b < 380 + c.prose_per_mille,
            # a quarter of prose pages are reserved listings — the
            # price-blocker phrases null all price extraction
            # (otodom.py:435-437)
            "reserved": (380 <= b < 380 + c.prose_per_mille
                         and self._bucket("reserved", oid) < 250),
            # an absurd floor number (e.g. 250) → the typed/range
            # validation gate drops the whole row, like the reference's
            # pydantic ValidationError path (M23, validate.py:9-50
            # floor∈[-2,200]; drop at detail.py:92/220)
            "bad_floor": 500 <= b < 520,
            # price served ONLY as zł/m² → the engine must derive
            # price = round(ppm2·area), currency PLN (the reference's
            # inverse price derivation, otodom.py:157-165)
            "ppm2_only": 520 <= b < 560,
            # a 0-zł price (portal data error) → the backend sink's
            # price<=0 reject (backend.py:100-107) drops the whole row
            "zero_price": 560 <= b < 575,
            # prose sub-bucket with a >5000-char description →
            # exercises the sink's description[:5000] truncation
            # (backend.py:128)
            "long_desc": (380 <= b < 380 + c.prose_per_mille
                          and self._bucket("longdesc", oid) < 300),
            # price published ONLY in the HTML banner header node
            # (otodom's adPageHeader, otodom.py:111-118): the structured
            # surfaces (LD+JSON, NEXT_DATA params) omit price_amount, so
            # html mode must recover it via banner-price extraction
            "banner_price": source == "otodom" and 600 <= b < 625,
            # multi-unit investment/development ad page (otodom.py:86-87):
            # pageProps carries paginatedUnits/developmentData and the
            # banner shows a decoy "od ..." starting price that must NOT
            # become price_amount (otodom.py:111-119); ground truth is
            # ppm2-only (price derived like the ppm2_only band)
            "multiunit": source == "otodom" and 625 <= b < 640,
            # posted_at in Polish 'dd.mm.yyyy HH:MM' format half the time
            "polish_date": b % 2 == 0,
        }

    def photo_url(self, source: str, oid: str, seq: int) -> str:
        return f"https://img.{source}.pl/{oid}/{seq}.jpg"

    # -- photo payload serving (media download substrate) -------------------

    _PHOTO_MAGICS = (b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n",
                     b"RIFF\x00\x00\x00\x00WEBP")

    def photo_head_mime(self, url: str) -> str | None:
        """Declared Content-Type for a photo URL — the synthetic HEAD
        probe (S2, reference images.py:48-60). A hash bucket of
        ``hotlink_per_mille`` URLs declares ``text/html`` (anti-hotlink
        interstitial); the media stage must reject those without ever
        requesting the body. Declared/actual mismatches in the other
        direction (declared image, body not an image) are exercised by
        the ``bad_photo_per_mille`` magic-sniff bucket."""
        m = _PHOTO_RE.match(url)
        if not m:
            return None
        oid, seq = m.group("oid"), int(m.group("seq"))
        if (_h64(self.cfg.seed, "headmime", oid, seq) % 1000
                < self.cfg.hotlink_per_mille):
            return "text/html"
        return "image/jpeg"

    def photo_bytes(self, url: str) -> bytes | None:
        """Deterministic image payload for a photo URL — the synthetic
        stand-in for the reference's HEAD+GET download
        (/root/reference/scrapper/core/images.py:48-91). A hash bucket of
        ``bad_photo_per_mille`` URLs serves a non-image payload (the
        content-type/magic mismatch the reference rejects)."""
        m = _PHOTO_RE.match(url)
        if not m:
            return None
        oid, seq = m.group("oid"), int(m.group("seq"))
        h = _h64(self.cfg.seed, "pbytes", oid, seq)
        body = hashlib.sha256(f"img|{self.cfg.seed}|{oid}|{seq}".encode()).digest()
        body = (body * (1 + (200 + h % 600) // len(body)))[: 200 + h % 600]
        if h % 1000 < self.cfg.bad_photo_per_mille:
            return b"GIF89a" + body  # unsupported format → sniff rejects
        return self._PHOTO_MAGICS[h % 3] + body

    # -- rendering ----------------------------------------------------------

    def render(self, url: str) -> list[dict] | None:
        """Render a page's spans; None for unknown/blocked pages."""
        ref = self.classify(url)
        if ref.kind == "listing":
            return self._render_listing(ref)
        if ref.kind in ("offer", "blocked"):
            # blocked pages exist and render their offer content — robots
            # is advisory; with cfg.robots=False the engine/oracle crawl
            # them like any detail page (reference has no robots at all)
            return self._render_offer(ref)
        if ref.kind == "investment":
            return self._render_investment(ref)
        return None

    def _link_target(self, source: str, region: str, k: int) -> str:
        """What a listing-card link for fresh offer k points at: a plain
        offer, an investment page (otodom), or a robots-blocked copy."""
        c = self.cfg
        b = self._bucket("ltype", source, region, k)
        if source == "otodom" and b < c.investment_per_mille:
            return self.investment_url(region, k)
        if (source == "otodom"
                and b < c.investment_per_mille + c.trap_per_mille):
            return self.trap_url(region, TRAP_K_BASE + k)
        if b >= 1000 - c.robots_blocked_per_mille:
            return self.offer_url(source, region, k, private=True)
        return self.offer_url(source, region, k)

    def _render_listing(self, ref: PageRef) -> list[dict]:
        c = self.cfg
        s, r, p = ref.source, ref.region, ref.page
        cp = self.content_pages(s, r)
        mode = self.tail_mode(s, r)
        ps = self.page_size(s)
        spans: list[dict] = []
        pos = 0

        def links_of_page(page: int) -> list[str]:
            lo, hi = (page - 1) * ps, page * ps
            ks = range(lo, hi)
            if ref.days is not None:
                # server-side recency pushdown: only offers posted within
                # the last `days` appear in the result list
                # (morizon.py:652-659 ps[date_from] semantics)
                ks = [k for k in ks if self.posted_days_ago(s, r, k) <= ref.days]
            return [self._link_target(s, r, k) for k in ks]

        if p <= cp:
            # overlap re-links from the previous page first (dup exercise)
            if p > 1 and c.overlap_links:
                for u in links_of_page(p - 1)[-c.overlap_links:]:
                    spans.append(span("link", media_ref=u, offset=pos)); pos += 1
            for u in links_of_page(p):
                spans.append(span("link", media_ref=u, offset=pos)); pos += 1
        elif mode == "no_new" and p <= cp + 3:
            for u in links_of_page(cp):  # all already seen
                spans.append(span("link", media_ref=u, offset=pos)); pos += 1
        else:
            return []  # empty page → 'no_links' stop

        spans.append(span("link", media_ref=self.listing_url(s, r, p + 1, ref.days),
                          offset=pos))
        return spans

    def _render_offer(self, ref: PageRef) -> list[dict]:
        f = self.offer_facts(ref.source, ref.region, ref.k)
        spans: list[dict] = []
        off = 0

        def text(field: str, value: object):
            nonlocal off
            spans.append(span("text", text=f"{field}={value}", offset=off))
            off += 1

        text("offer_id", f["oid"])
        text("source", ref.source)
        text("title", f"Mieszkanie {f['city']} {f['rooms']} pok. {f['true_area']} m2")
        if f["inquiry"]:
            text("inquiry", 1)  # 'Zapytaj o cenę' → no price spans
        elif f["ppm2_only"] or f["multiunit"]:
            # only the per-m² figure is published — the parser derives
            # the total price (otodom.py:157-165); multi-unit pages
            # additionally serve a decoy banner price in HTML mode that
            # the extractor must suppress (otodom.py:111-119)
            text("price_per_m2", f"{f['ppm2']} zł/m2")
        elif f["zero_price"]:
            text("price_amount", "0 zł")
            text("price_currency", "PLN")
        elif not f["prose"]:
            text("price_amount", f"{f['price']:.0f} zł")
            text("price_currency", "pln" if f["lower_currency"] else "PLN")
            if not f["omit_ppm2"]:
                text("price_per_m2", f"{f['ppm2']} zł/m2")
        text("city", f["city"])
        text("district", f["district"])
        if f["street"] is not None:
            text("street", f["street"])
        if not f["missing_geo"]:
            text("lat", f["lat"])
            text("lon", f["lon"])
        area = round(f["true_area"] * 1.2, 1) if f["bad_area"] else f["true_area"]
        if f["prose"]:
            # M13/M14 surface: price/area/rooms live only in Polish
            # prose — decoys exercise the reference rules: a range
            # (stripped, morizon.py:298), a sub-10-m² cellar (out of
            # [10,1000]), the zł/m² context exclusion, and for reserved
            # listings the price-blocker phrases
            text("description", self._prose_description(f, area))
        else:
            text("area_m2", f"{area} m²")
            text("rooms", f["rooms"])
        text("floor", f["floor"])
        text("floors", f["floors"])
        text("market_type", f["market_type"])
        text("property_type", f["property_type"])
        text("posted_at", self._fmt_date(f["posted_days_ago"], f["polish_date"]))
        text("updated_at", self._fmt_date(f["updated_days_ago"], not f["polish_date"]))

        urls = [self.photo_url(ref.source, f["oid"], i) for i in range(f["n_photos"])]
        if f["dup_photo"]:
            urls.append(urls[0])  # duplicate → dropped keep-first
        for seq, u in enumerate(urls):
            spans.append(span("image", media_ref=u, offset=seq))
        return spans

    def _prose_description(self, f: dict, area: float) -> str:
        """Deterministic Polish prose carrying price/area/rooms. The
        sentence order (total price before zł/m²) matters: the
        reference's PRICE_TOTAL_RE takes the FIRST number followed by
        zł/PLN (gratka.py:20-21), so the total must precede the
        per-m² figure — faithfully reproduced here."""
        if f["reserved"]:
            return ("Zarezerwowano. Oferta chwilowo niedostepna, "
                    "zapraszamy wkrotce.")
        grp = f"{int(f['price']):,}".replace(",", " ")
        ppm2 = f"{f['ppm2']}".replace(".", ",")
        a = f"{area}".replace(".", ",")
        # long_desc pages pad past 5000 chars so the sink's
        # description[:5000] truncation (backend.py:128) is exercised;
        # the extractable facts stay in the first sentences
        tail = (" Okolica pelna zieleni, blisko szkoly i przystanku." * 120
                if f["long_desc"] else "")
        return (f"Cena {grp} zł ({ppm2} zł/m²). Powierzchnia {a} m², "
                f"do tego piwnica 8 m² i taras 12–18 m². "
                f"{f['rooms']} pokoje, świetny stan.{tail}")

    def _render_investment(self, ref: PageRef) -> list[dict]:
        c = self.cfg
        if ref.k >= TRAP_K_BASE:
            # trap page: ALWAYS exactly one link — the next hop of its
            # own chain, a fresh never-seen URL (the infinite calendar/
            # session-id pattern). Never yields an offer.
            return [span("link",
                         media_ref=self.trap_url(ref.region, ref.k,
                                                 ref.page + 1),
                         offset=0)]
        per_page = 3
        units = [INVEST_UNIT_BASE + ref.k * 10 + u for u in range(c.investment_units)]
        lo = (ref.page - 1) * per_page
        chunk = units[lo:lo + per_page]
        spans = [
            span("link", media_ref=self.offer_url("otodom", ref.region, uk), offset=i)
            for i, uk in enumerate(chunk)
        ]
        if lo + per_page < len(units):
            spans.append(span("link", media_ref=self.investment_url(ref.region, ref.k, ref.page + 1),
                              offset=len(chunk)))
        return spans

    # -- HTML rendering (realistic fetched+parsed payloads) -----------------
    #
    # With ``cfg.html_bytes > 0`` a page is served as HTML: the same
    # facts as the span document, embedded in deterministic boilerplate
    # of roughly ``html_bytes`` bytes. The fetch stage then runs the
    # regex extractor chain (stages/fetch.py ``html_to_spans``) — the
    # Ray-side analogue of the reference's selector/regex parsers
    # (otodom.py:315-376, gratka.py:429-499) — and must recover exactly
    # the span document (tests/test_portal.py asserts equivalence).

    _FILLER = (
        "<p class=\"seo-text\">Nieruchomości na sprzedaż — sprawdź "
        "najnowsze ogłoszenia, ceny za metr, lokalizacje i zdjęcia. "
        "Rynek pierwotny i wtórny, mieszkania i apartamenty.</p>\n"
        "<div class=\"ad-slot\" data-slot=\"baner\"><span>reklama</span></div>\n"
    )

    def _html_doc(self, elements: list[str]) -> str:
        """Interleave elements with filler, padding to ~cfg.html_bytes so
        every regex pass scans a realistically-sized document."""
        target = self.cfg.html_bytes
        parts = ["<!DOCTYPE html><html><head><title>ogloszenia</title></head><body>\n"]
        n = max(1, len(elements))
        gap = max(1, (target - sum(map(len, elements))) // (len(self._FILLER) * (n + 1)))
        for el in elements:
            parts.extend([self._FILLER] * gap)
            parts.append(el)
            parts.append("\n")
        size = sum(map(len, parts))
        if size < target:
            parts.extend([self._FILLER] * ((target - size) // len(self._FILLER) + 1))
        parts.append("</body></html>")
        return "".join(parts)

    # JSON-LD-capable field names (schema.org Product/Offer vocabulary)
    _LD_CAPABLE = ("title", "price_amount", "price_currency", "city",
                   "street", "lat", "lon", "area_m2", "rooms")

    # LD script open-tag variants: 0/1 the canonical serialization
    # (literal fast path), 2/3 attribute noise / single quotes — the
    # extractor needs its tolerant regex pass for those
    _LD_TAGS = ('<script type="application/ld+json">',
                '<script type="application/ld+json">',
                '<script data-rh="true" type="application/ld+json">',
                "<script type='application/ld+json'>")

    def _ld_block(self, fields: dict[str, str], ld_keys: list[str],
                  images: list[str] | None, tag_variant: int = 0) -> str:
        """A realistic schema.org JSON-LD @graph block: Product with
        nested Offer / GeoCoordinates / PostalAddress / floorSize, plus
        a BreadcrumbList noise node (the reference's LD walk must skip
        non-Product nodes, otodom.py:220-313)."""
        import json as _json
        from ..functions.urls import coerce_float
        product: dict = {"@type": "Product"}
        if "title" in ld_keys:
            product["name"] = fields["title"]
        offers: dict = {}
        if "price_amount" in ld_keys:
            offers["price"] = coerce_float(fields["price_amount"])
        if "price_currency" in ld_keys:
            offers["priceCurrency"] = fields["price_currency"]
        if offers:
            product["offers"] = {"@type": "Offer", **offers}
        if "lat" in ld_keys:
            product["geo"] = {"@type": "GeoCoordinates",
                              "latitude": float(fields["lat"]),
                              "longitude": float(fields["lon"])}
        addr: dict = {}
        if "city" in ld_keys:
            addr["addressLocality"] = fields["city"]
        if "street" in ld_keys:
            addr["streetAddress"] = fields["street"]
        if addr:
            product["address"] = {"@type": "PostalAddress", **addr}
        if "area_m2" in ld_keys:
            product["floorSize"] = {"@type": "QuantitativeValue",
                                    "value": coerce_float(fields["area_m2"])}
        if "rooms" in ld_keys:
            product["numberOfRooms"] = int(fields["rooms"])
        if images:
            product["image"] = images
        crumbs = {"@type": "BreadcrumbList", "itemListElement": [
            {"@type": "ListItem", "position": 1, "name": "Nieruchomości"},
            {"@type": "ListItem", "position": 2, "name": "Mieszkania"}]}
        doc = {"@context": "https://schema.org", "@graph": [crumbs, product]}
        return (self._LD_TAGS[tag_variant % len(self._LD_TAGS)]
                + _json.dumps(doc, ensure_ascii=False, separators=(",", ":"))
                + "</script>")

    def _seo_pad_json(self) -> str:
        """Serialized page-independent NEXT_DATA padding (cached)."""
        cached = getattr(self, "_seo_pad_cache", None)
        if cached is None:
            import json as _json
            entry = {"tag": "listing-seo-link", "w": 120, "h": 80,
                     "path": "/pl/wyniki/sprzedaz/mieszkanie", "active": True}
            n_pad = max(0, (self.cfg.html_bytes - 2000) // 96)
            cached = _json.dumps({f"k{i:05d}": entry for i in range(n_pad)},
                                 separators=(",", ":"))
            self._seo_pad_cache = cached
        return cached

    # -- per-portal listing card markup -------------------------------------
    #
    # Attribute order, quoting style and decoy elements vary by a
    # per-target hash so the extractors must be attribute-order- and
    # quote-insensitive (the tolerance BeautifulSoup gives the
    # reference, core/parse.py:10-26). Decoys render in HTML only —
    # never in the span document — so a portal extractor that fails to
    # filter them breaks the html-mode ≡ span-mode equality tests.

    def _is_pagination(self, ref: PageRef, target: str) -> bool:
        return self.classify(target).kind == "listing" or (
            ref.kind == "investment" and "?page=" in target)

    def _otodom_listing_els(self, ref: PageRef, url: str,
                            targets: list[str]) -> list[str]:
        """Otodom cards (otodom.py:497-534): article containers with
        data-cy anchors; investment targets get the evkld750 badge +
        "Ukończona" marker; a decoy in-progress investment card must be
        dropped by the badge rule."""
        els: list[str] = []
        for t in targets:
            if self._is_pagination(ref, t):
                els.append(f'<a href="{t}">następna</a>')
                continue
            v = _h64(self.cfg.seed, "attrvar", t) % 4
            if self.classify(t).kind == "investment":
                els.append(
                    '<article data-sentry-element="Container">'
                    '<aside class="evkld750-badge">Inwestycja</aside>'
                    '<span>Ukończona</span>'
                    f'<a data-cy="listing-item-link" href="{t}">osiedle</a>'
                    '</article>')
                continue
            a = (f'<a data-cy="listing-item-link" href="{t}">oferta</a>',
                 f'<a href="{t}" data-cy="listing-item-link">oferta</a>',
                 f"<a href='{t}' class=\"css-1x2y\" "
                 f"data-cy='listing-item-link'>oferta</a>",
                 f'<a href={t} data-cy=listing-item-link>oferta</a>')[v]
            els.append(f'<article data-sentry-element="Container">{a}</article>')
        if ref.kind == "listing" and els and _h64(
                self.cfg.seed, "invdecoy", url) % 3 == 0:
            decoy = self.investment_url(ref.region, 888000 + ref.page)
            els.insert(_h64(self.cfg.seed, "invdecoypos", url) % len(els),
                       '<article data-sentry-element="Container">'
                       '<aside class="evkld750-badge">Inwestycja</aside>'
                       '<span>W budowie</span>'
                       f'<a data-cy="listing-item-link" href="{decoy}">'
                       'osiedle</a></article>')
        return els

    def _gratka_listing_els(self, ref: PageRef, url: str,
                            targets: list[str]) -> list[str]:
        """Gratka article cards (gratka.py:618-665): /ob/ anchor +
        location text; a decoy card with a foreign city must be dropped
        by the normalized-city containment filter."""
        city = ref.region.split("-")[0].capitalize()
        els: list[str] = []
        for t in targets:
            if self._is_pagination(ref, t):
                els.append(f'<a href="{t}">następna</a>')
                continue
            v = _h64(self.cfg.seed, "attrvar", t) % 3
            loc = f"{city}, {ref.region}"
            card = (
                f'<article data-cy="listing-item"><a href="{t}">Mieszkanie'
                f'</a><div data-cy="listing-item-location">{loc}</div>'
                '</article>',
                f'<article><a href="{t}">Mieszkanie</a>'
                f'<p class="teaser__location">{loc}</p></article>',
                f"<article data-cy='listing-item'><a href='{t}'>"
                f"Mieszkanie, {loc}</a></article>")[v]
            els.append(card)
        if els and _h64(self.cfg.seed, "obdecoy", url) % 3 == 0:
            oid = self.oid("gratka", ref.region, 999999)
            decoy = (f"https://{self.host('gratka', ref.region)}"
                     f"/nieruchomosci/mieszkanie-{ref.region}-999999/ob/{oid}")
            els.insert(_h64(self.cfg.seed, "obdecoypos", url) % len(els),
                       f'<article data-cy="listing-item"><a href="{decoy}">'
                       'Mieszkanie</a><div data-cy="listing-item-location">'
                       'Praga, Czechy</div></article>')
        return els

    def _morizon_listing_els(self, ref: PageRef, url: str,
                             targets: list[str]) -> list[str]:
        """Morizon raw anchors (morizon.py:95-113): absolute or
        relative mzn hrefs; a decoy non-offer link must be dropped at
        the mzn-id pattern level."""
        els: list[str] = []
        for t in targets:
            if self._is_pagination(ref, t):
                els.append(f'<a href="{t}">następna</a>')
                continue
            if _h64(self.cfg.seed, "relhref", t) % 2 == 0:
                path = t[t.find("/", t.find("//") + 2):]  # relative form
                els.append(f'<a href="{path}">Mieszkanie</a>')
            else:
                els.append(f'<a href="{t}">Mieszkanie</a>')
        if els and _h64(self.cfg.seed, "mzndecoy", url) % 3 == 0:
            els.insert(_h64(self.cfg.seed, "mzndecoypos", url) % len(els),
                       '<a href="https://www.morizon.pl/kredyty/hipoteczny">'
                       'kredyt hipoteczny</a>')
        return els

    def _generic_listing_els(self, ref: PageRef,
                             targets: list[str]) -> list[str]:
        """Generic data-cy dialect (trojmiasto + §2.10 extension
        sources), quote-style varied."""
        els: list[str] = []
        for t in targets:
            if self._is_pagination(ref, t):
                els.append(f'<a class="pagination-next" href="{t}">następna</a>')
                continue
            v = _h64(self.cfg.seed, "attrvar", t) % 2
            a = (f'<a data-cy="listing-item-link" href="{t}">oferta</a>',
                 f"<a href='{t}' data-cy='listing-item-link'>oferta</a>")[v]
            els.append(f'<article data-cy="listing-item">{a}</article>')
        return els

    def render_html(self, url: str) -> str | None:
        spans = self.render(url)
        if spans is None:
            return None
        ref = self.classify(url)
        els: list[str] = []
        if ref.kind in ("listing", "investment"):
            # per-portal listing dialects — each source serves its own
            # card markup, mirroring the reference's per-adapter
            # selectors (otodom.py:497-534 data-cy cards + investment
            # badges; gratka.py:618-665 article cards + location text;
            # morizon.py:95-113 raw mzn hrefs); trojmiasto + extension
            # sources use the generic data-cy dialect
            source = "otodom" if ref.kind == "investment" else ref.source
            targets = [s["media_ref"]
                       for s in sorted(spans, key=lambda s: s["offset"])]
            if source == "otodom":
                els = self._otodom_listing_els(ref, url, targets)
            elif source == "gratka":
                els = self._gratka_listing_els(ref, url, targets)
            elif source == "morizon":
                els = self._morizon_listing_els(ref, url, targets)
            else:
                els = self._generic_listing_els(ref, targets)
            return self._html_doc(els)
        # Offer pages distribute the same facts across the reference's
        # real per-portal parse surfaces (presence preserved, so
        # html-mode crawl output ≡ span-mode output):
        #   otodom: JSON-LD Product (otodom.py:220-313) +
        #     __NEXT_DATA__ ``ad`` params/images (otodom.py:57-190)
        #   trojmiasto: __NEXT_DATA__ ``advert`` structured object with
        #     the characteristics walk (trojmiasto.py:283-330) — no LD
        #   gratka: JSON-LD (±geo) + div[data-cy=propertyNumber] offer
        #     id (gratka.py:613-616) + CSS params + Leaflet L.marker geo
        #     fallback (M17)
        #   morizon: JSON-LD (±geo) + CSS params + hydrated map-bounds
        #     geo fallback (morizon.py:26-29, 115-140); photos alternate
        #     LD image lists ↔ gallery srcset (argmax-by-width, M26)
        #   extension sources: the generic LD + params + Leaflet dialect
        fields: dict[str, str] = {}
        images: list[str] = []
        for s in sorted(spans, key=lambda s: s["offset"]):
            if s["kind"] == "text":
                k, _, v = s["text"].partition("=")
                fields.setdefault(k, v)
            else:
                images.append(s["media_ref"])
        h = _h64(self.cfg.seed, "htmlvar", ref.oid)
        ld_tag = _h64(self.cfg.seed, "ldtag", ref.oid) % 4  # 0/1 literal
        if ref.source == "otodom":
            import json as _json
            # the two page-shape flags need only the variant bucket —
            # the full offer_facts walk (~30 hashes) is paid only on the
            # 2.5 % banner pages that must format the ground-truth price
            b = self._bucket("variant", ref.oid)
            # banner bucket: price_amount leaves the structured surfaces
            # and is served only in the page-header price node, so the
            # extractor's banner path (otodom.py:111-118) must recover it
            banner_only = 600 <= b < 625 and "price_amount" in fields
            multiunit = 625 <= b < 640
            ld_keys = [k for k in self._LD_CAPABLE if k in fields
                       and not (banner_only and k == "price_amount")]
            els.append(self._ld_block(fields, ld_keys, None, ld_tag))
            params = [[k, v] for k, v in fields.items()
                      if not (banner_only and k == "price_amount")]
            ad = _json.dumps({"id": ref.oid, "params": params,
                              "images": images}, separators=(",", ":"))
            # multi-unit marker: a truthy paginatedUnits/developmentData
            # sibling of `ad` inside pageProps (otodom.py:86-87)
            mu = ""
            if multiunit:
                mu = (',"paginatedUnits":[{"id":1},{"id":2}]'
                      if h % 2 == 0 else
                      ',"developmentData":{"name":"Osiedle Parkowe"}')
            # identical page bytes as serializing the whole payload at
            # once: the seo pad is page-independent, so its serialized
            # form is built once per portal and spliced in
            payload = ('{"props":{"pageProps":{"ad":' + ad[:-1]
                       + ',"seo":' + self._seo_pad_json() + '}' + mu + '}}}')
            els.append('<script id="__NEXT_DATA__" type="application/json">'
                       + payload + "</script>")
            if banner_only or multiunit:
                if banner_only:
                    price = self.offer_facts(ref.source, ref.region,
                                             ref.k)["price"]
                    grp = f"{int(price):,}".replace(",", " ")
                    ptxt = f"{grp} zł"
                else:  # decoy "starting from" price on the multi-unit page
                    ptxt = "od 999 000 zł"
                v = _h64(self.cfg.seed, "bannersel", ref.oid) % 4
                els.append((
                    f'<div data-cy="adPageHeader-price">{ptxt}</div>',
                    f'<div data-testid="ad-price">{ptxt}</div>',
                    f'<span class="css-price-box">{ptxt}</span>',
                    f"<div data-cy='adPageHeader-price' class='hdr'>{ptxt}</div>",
                )[v])
            return self._html_doc(els)
        if ref.source == "trojmiasto":
            import json as _json

            from ..stages.portals import fields_to_advert
            adv = _json.dumps(fields_to_advert(fields, images),
                              ensure_ascii=False, separators=(",", ":"))
            # seo pad is a SIBLING of advert so the partial-parse
            # raw_decode of the advert value never touches it
            payload = ('{"props":{"pageProps":{"advert":' + adv
                       + ',"seo":' + self._seo_pad_json() + '}}}')
            open_tag = (
                '<script id="__NEXT_DATA__" type="application/json">'
                if h % 2 == 0 else
                "<script type='application/json' id='__NEXT_DATA__'>")
            els.append(open_tag + payload + "</script>")
            return self._html_doc(els)
        ld_no_geo = h % 10 < 3
        photos_in_ld = h % 2 == 0
        is_gratka = ref.source == "gratka"
        is_morizon = ref.source == "morizon"
        ld_keys = [k for k in self._LD_CAPABLE if k in fields]
        if ld_no_geo:
            ld_keys = [k for k in ld_keys if k not in ("lat", "lon")]
        els.append(self._ld_block(fields, ld_keys,
                                  images if photos_in_ld and images else None,
                                  ld_tag))
        if ld_no_geo and "lat" in fields:
            if is_morizon:
                # hydrated map bounds: NE == SW == the point, so the
                # extractor's corner average recovers it exactly
                la, lo = fields["lat"], fields["lon"]
                els.append('<script>window.__HYDRATED__=['
                           '{"latitude":101,"longitude":102},'
                           f'{la},{lo},'
                           '{"latitude":103,"longitude":104},'
                           f'{la},{lo}]</script>')
            else:
                els.append(f'<script>var map=L.map("map");'
                           f'L.marker([{fields["lat"]}, {fields["lon"]}])'
                           f'.addTo(map);</script>')
        if is_gratka and "offer_id" in fields:
            els.append(f'<div data-cy="propertyNumber">'
                       f'gratka-{fields["offer_id"]}</div>')
        for k, v in fields.items():
            if k in ld_keys or (ld_no_geo and k in ("lat", "lon")):
                continue
            if is_gratka and k == "offer_id":
                continue  # carried by the propertyNumber div
            els.append(f'<div class="param" data-field="{k}">{v}</div>')
        if images and not photos_in_ld:
            for u in images:
                els.append(f'<img class="gallery" srcset="{u}?w=320 320w, '
                           f'{u} 1280w, {u}?w=640 640w"/>')
        return self._html_doc(els)

    # -- materialization (the Lance/parquet documents table) ---------------

    def all_urls(self) -> list[str]:
        """Every fetchable page URL of the portal (crawl-reachable set)."""
        out: list[str] = []
        for s in self.cfg.sources:
            for r in self.cfg.regions:
                cp = self.content_pages(s, r)
                # reachable pages incl. the terminal empty page: otodom
                # has no no_new stop, so it walks the 3 repeat pages and
                # then fetches cp+4 (empty → no_links stop)
                last = cp + (4 if self.tail_mode(s, r) == "no_new" else 1)
                ps = self.page_size(s)
                for p in range(1, last + 1):
                    out.append(self.listing_url(s, r, p))
                for k in range(cp * ps):
                    t = self._link_target(s, r, k)
                    tref = self.classify(t)
                    if tref.kind in ("offer", "blocked"):
                        # blocked pages are reachable when robots=False
                        out.append(t)
                    elif tref.kind == "investment":
                        out.append(t)
                        out.append(self.investment_url(r, k, 2))
                        for u in range(self.cfg.investment_units):
                            out.append(self.offer_url("otodom", r, INVEST_UNIT_BASE + k * 10 + u))
        return out

    def documents_table(self, urls: list[str] | None = None) -> pa.Table:
        urls = urls if urls is not None else self.all_urls()
        spans = [self.render(u) or [] for u in urls]
        return pa.Table.from_pydict({"doc_id": urls, "spans": spans}, schema=DOCUMENTS)

    def write_documents(self, path: str, row_group_size: int = 1024) -> None:
        """Materialize the documents table SORTED by doc_id in bounded
        row groups: exact per-row-group min/max statistics make the
        table randomly addressable by doc_id (sources/docstore.py) —
        a fetch actor reads only the row groups its batch touches,
        never the table."""
        import pyarrow.parquet as pq

        t = self.documents_table()
        t = t.take(pc.sort_indices(t["doc_id"]))
        pq.write_table(t, path, row_group_size=row_group_size)
