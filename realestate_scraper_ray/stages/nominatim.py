"""Real Nominatim geocoder backend for the geocode service (J4/ST4).

Re-expresses the reference's two OSM geocode dialects on the engine's
``HttpSession`` so the existing machinery — query chain, per-level
verification, cache actor, snap — gets a live wire implementation:

- gratka's ``_osm_geocode_pl`` (adapters/gratka.py:326-426):
  ``GET /search?q=…&format=jsonv2&limit=3&countrycodes=pl&
  addressdetails=1``; up to three records are inspected; a record is
  accepted only when its STRUCTURED address fields (with a
  ``display_name`` containment fallback) match the query terms for the
  level — city always (city/town/village/municipality/county), street
  for street-level queries (road/pedestrian/footway/residential),
  district for district-level ones (suburb/neighbourhood/city_district/
  borough) — and its point is plausibly inside Poland.
- morizon's ``_geocode_osm`` (adapters/morizon.py:427-468): same
  endpoint with ``limit=1&addressdetails=0&viewbox=…&bounded=1``; the
  engine keeps gratka's richer dialect (limit=3 + structured
  verification) because it subsumes morizon's and the cache layer above
  it is shared.

Pacing: the public Nominatim usage policy is absolute-max 1 request/s,
which the reference honors via its client-level RPS (morizon.py:429).
Here the backend itself enforces ``min_interval_s`` between WIRE
requests (cache hits in the ``GeocoderActor`` above never reach it) —
correct in the engine because all Nominatim traffic funnels through the
single geocoder cache actor, not through the fetch pool.

The backend is a plain callable ``query -> (lat, lon, display) | None``
with the same contract as ``geo.synthetic_geocode``, so
``GeocoderActor(backend=…)`` swaps transports with zero changes to the
chain/verification/snap logic — and tests drive it against a local
in-process HTTP server serving jsonv2-shaped JSON.
"""

from __future__ import annotations

import json
import time
import urllib.parse
from dataclasses import dataclass, field
from typing import Callable

from ..functions.urls import slugify
from .geo import GeocodeUnavailable
from .http import HttpSession

# Poland bbox (lat_min, lat_max, lon_min, lon_max) — the reference's
# ``_is_plausible_pl`` gate (morizon.py / gratka.py share the constant;
# fetch.py's M18 emit gate uses the same box).
PL_BBOX = (49.0, 54.84, 14.12, 24.15)

# structured-address keys per verification level (gratka.py:401-419)
_CITY_KEYS = ("city", "town", "village", "municipality", "county")
_STREET_KEYS = ("road", "pedestrian", "footway", "residential")
_DISTRICT_KEYS = ("suburb", "neighbourhood", "city_district", "borough")


def _plausible_pl(lat: float | None, lon: float | None) -> bool:
    if lat is None or lon is None:
        return False
    return (PL_BBOX[0] <= lat <= PL_BBOX[1]
            and PL_BBOX[2] <= lon <= PL_BBOX[3])


def _coerce_float(v: object) -> float | None:
    try:
        return float(v)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        return None


def _addr_has(addr: dict, keys: tuple[str, ...], needle: str | None) -> bool:
    """gratka.py:27-40 — does any of the given normalized address
    fields contain the normalized needle? Empty needle matches."""
    if not needle:
        return True
    for k in keys:
        v = addr.get(k)
        if v and needle in slugify(str(v)):
            return True
    return False


def nominatim_record_matches(rec: dict, level: str, street: str | None,
                             district: str | None, city: str | None) -> bool:
    """Structured verification of one jsonv2 record (gratka.py:394-421):
    city must match always; street/district only at their levels; each
    check tries the structured ``address`` fields first and falls back
    to ``display_name`` containment. This is the wire-record twin of
    ``geo.geocode_result_matches`` (which sees only a display string)."""
    addr = rec.get("address") or {}
    if not isinstance(addr, dict):
        addr = {}
    dn = slugify(str(rec.get("display_name") or ""))
    city_n = slugify(city) if city else None
    if city_n and not _addr_has(addr, _CITY_KEYS, city_n) and city_n not in dn:
        return False
    if level == "street" and street:
        street_n = slugify(street)
        if not _addr_has(addr, _STREET_KEYS, street_n) and street_n not in dn:
            return False
    if level == "district" and district:
        district_n = slugify(district)
        if (not _addr_has(addr, _DISTRICT_KEYS, district_n)
                and district_n not in dn):
            return False
    return True


@dataclass
class NominatimBackend:
    """Callable geocode backend: ``query -> (lat, lon, display) | None``.

    One instance lives inside the (single) ``GeocoderActor``; its
    ``HttpSession`` persists across lookups (ST3) and ``min_interval_s``
    paces wire requests to the public usage policy. The query string is
    lowercased like morizon.py:435 before hitting the wire (Nominatim is
    case-insensitive; the cache layer above keys on the original)."""

    base_url: str = "https://nominatim.openstreetmap.org/search"
    user_agent: str = "realestate-scraper-ray/1.0"
    limit: int = 3
    min_interval_s: float = 1.0
    session: HttpSession | None = None
    sleep: Callable[[float], None] = time.sleep
    now: Callable[[], float] = time.monotonic
    n_wire: int = field(default=0, init=False)
    _last_t: float = field(default=float("-inf"), init=False)

    def __post_init__(self):
        if self.session is None:
            self.session = HttpSession(user_agent=self.user_agent)

    def search(self, query: str) -> list[dict]:
        """One paced wire call; returns the (possibly empty) jsonv2
        record list. Transport/status failures after the session's
        retry budget raise ``GeocodeUnavailable`` — callers fall
        through the query chain like the reference (gratka.py:382-383
        ``except Exception: continue``) but must NOT cache the miss:
        an authoritative "no result" is an empty 200 list, anything
        else is the backend being down."""
        wait = self.min_interval_s - (self.now() - self._last_t)
        if wait > 0:
            self.sleep(wait)
        url = self.base_url + "?" + urllib.parse.urlencode({
            "q": query.strip().lower(),
            "format": "jsonv2",
            "limit": str(self.limit),
            "countrycodes": "pl",
            "addressdetails": "1",
        })
        self.n_wire += 1
        self._last_t = self.now()
        try:
            resp = self.session.get(url, accept="application/json")
        except Exception as e:
            raise GeocodeUnavailable(f"nominatim transport: {e}") from e
        try:
            data = json.loads(resp.text())
        except ValueError as e:
            raise GeocodeUnavailable("nominatim returned non-JSON") from e
        if not isinstance(data, list):
            raise GeocodeUnavailable("nominatim returned non-list JSON")
        return [r for r in data if isinstance(r, dict)]

    def __call__(self, query: str) -> tuple[float, float, str] | None:
        """First plausible-in-Poland record wins; per-level term
        verification happens in the chain layer above (via the returned
        display name) AND can be done wire-side with
        ``nominatim_record_matches`` when the caller passes structured
        terms — ``lookup_verified`` below does both."""
        for rec in self.search(query):
            lat = _coerce_float(rec.get("lat"))
            lon = _coerce_float(rec.get("lon"))
            if _plausible_pl(lat, lon):
                return lat, lon, str(rec.get("display_name") or "")
        return None

    def lookup_verified(self, level: str, street: str | None,
                        district: str | None, city: str | None,
                        query: str) -> tuple[float, float, str] | None:
        """gratka-exact record loop: scan up to ``limit`` records,
        accept the first that is plausible AND structurally matches the
        query terms for its level."""
        for rec in self.search(query):
            lat = _coerce_float(rec.get("lat"))
            lon = _coerce_float(rec.get("lon"))
            if not _plausible_pl(lat, lon):
                continue
            if nominatim_record_matches(rec, level, street, district, city):
                return lat, lon, str(rec.get("display_name") or "")
        return None
