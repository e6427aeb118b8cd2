"""NominatimBackend (stages/nominatim.py): the reference's OSM geocode
wire dialect (adapters/gratka.py:326-426 + adapters/morizon.py:427-468)
against a local in-process HTTP server — request shape, record
verification against structured address fields with display_name
fallback, Poland-bbox plausibility, empty/garbage responses, 1-rps
pacing, and the GeocoderActor plug-in path with cache persistence."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from realestate_scraper_ray.stages.geo import GeocodeUnavailable
from realestate_scraper_ray.stages.http import HttpSession
from realestate_scraper_ray.stages.nominatim import (
    NominatimBackend, nominatim_record_matches,
)

NOSLEEP = lambda *_: None  # noqa: E731


def _rec(lat, lon, display, **addr):
    return {"lat": str(lat), "lon": str(lon), "display_name": display,
            "address": addr}


RESPONSES = {
    # first record wrong city (verification must skip), second good
    "długa, gdańsk, polska": [
        _rec(52.23, 21.01, "Długa, Warszawa, Polska", city="Warszawa",
             road="Długa"),
        _rec(54.349, 18.653, "Długa, Gdańsk, Polska", city="Gdańsk",
             road="Długa"),
    ],
    # structured fields absent -> display_name containment fallback
    "wrzeszcz, gdańsk, polska": [
        {"lat": "54.37", "lon": "18.62",
         "display_name": "Wrzeszcz, Gdańsk, Polska"},
    ],
    # plausible=False (outside PL bbox) then garbage lat
    "atlantyda, polska": [
        _rec(10.0, 10.0, "Atlantyda"),
        {"lat": "not-a-number", "lon": "18.0", "display_name": "x"},
    ],
    "pusto, polska": [],
}


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):
        pass

    def do_GET(self):
        srv = self.server
        parsed = urllib.parse.urlsplit(self.path)
        params = dict(urllib.parse.parse_qsl(parsed.query))
        srv.seen.append((parsed.path, params, dict(self.headers)))
        if parsed.path == "/notalist":
            body = json.dumps({"error": "rate limited"}).encode()
        else:
            body = json.dumps(
                RESPONSES.get(params.get("q", ""), [])).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.seen = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _backend(base, **kw):
    kw.setdefault("min_interval_s", 0.0)
    kw.setdefault("sleep", NOSLEEP)
    return NominatimBackend(base_url=base + "/search", **kw)


def test_request_shape_is_reference_exact(server):
    """gratka.py:374-380: q (lowercased, morizon.py:435), format=jsonv2,
    limit=3, countrycodes=pl, addressdetails=1; Accept header set."""
    srv, base = server
    _backend(base)("Długa, Gdańsk, Polska")  # backend lowercases on wire
    path, params, headers = srv.seen[0]
    assert path == "/search"
    assert params["format"] == "jsonv2"
    assert params["limit"] == "3"
    assert params["countrycodes"] == "pl"
    assert params["addressdetails"] == "1"
    assert params["q"] == params["q"].lower()
    assert headers.get("Accept") == "application/json"
    assert "realestate-scraper-ray" in headers.get("User-Agent", "")


def test_lookup_verified_skips_wrong_city_record(server):
    srv, base = server
    b = _backend(base)
    hit = b.lookup_verified("street", "Długa", None, "Gdańsk",
                            "Długa, Gdańsk, Polska")
    assert hit is not None
    lat, lon, display = hit
    assert (round(lat, 3), round(lon, 3)) == (54.349, 18.653)
    assert "Gdańsk" in display
    # exactly one wire call served both records
    assert b.n_wire == 1 and len(srv.seen) == 1


def test_display_name_fallback_when_address_fields_absent(server):
    _, base = server
    hit = _backend(base).lookup_verified(
        "district", None, "Wrzeszcz", "Gdańsk", "wrzeszcz, gdańsk, polska")
    assert hit is not None and hit[0] == 54.37


def test_implausible_and_garbage_records_rejected(server):
    _, base = server
    assert _backend(base)("atlantyda, polska") is None


def test_empty_response_gives_none_nonlist_raises(server):
    """A 200 with an empty list is an AUTHORITATIVE miss (None,
    cacheable); a 200 whose body is not a record list is the backend
    malfunctioning and must raise GeocodeUnavailable so the cache layer
    skips it (a cached None never re-geocodes — permanent data loss)."""
    _, base = server
    assert _backend(base)("pusto, polska") is None
    b = NominatimBackend(base_url=base + "/notalist", min_interval_s=0.0,
                         sleep=NOSLEEP)
    with pytest.raises(GeocodeUnavailable):
        b("anything")


def test_transport_failure_raises_unavailable():
    """Connection refused (nothing listening) after the retry budget →
    GeocodeUnavailable, not an empty result."""
    b = NominatimBackend(base_url="http://127.0.0.1:9/search",
                         min_interval_s=0.0, sleep=NOSLEEP,
                         session=HttpSession(user_agent="t", attempts=1,
                                             sleep=NOSLEEP, timeout_s=2.0))
    with pytest.raises(GeocodeUnavailable):
        b("wrzeszcz, gdańsk, polska")


def test_record_matches_levels():
    rec = _rec(54.35, 18.65, "Długa, Śródmieście, Gdańsk, Polska",
               city="Gdańsk", road="Długa", suburb="Śródmieście")
    assert nominatim_record_matches(rec, "street", "Długa", None, "Gdańsk")
    assert not nominatim_record_matches(rec, "street", "Miodowa", None,
                                        "Gdańsk")
    assert nominatim_record_matches(rec, "district", None, "Śródmieście",
                                    "Gdańsk")
    assert not nominatim_record_matches(rec, "district", None, "Oliwa",
                                        "Gdańsk")
    assert nominatim_record_matches(rec, "city", None, None, "Gdańsk")
    assert not nominatim_record_matches(rec, "city", None, None, "Sopot")
    # street check only binds at street level
    assert nominatim_record_matches(rec, "city", "Miodowa", None, "Gdańsk")


def test_wire_pacing_honors_min_interval(server):
    """Public usage policy: ≥min_interval_s between WIRE calls. Fake
    clock: first call free, second must sleep the remaining window."""
    _, base = server
    clock = {"t": 100.0}
    slept = []

    def sleep(s):
        slept.append(round(s, 3))
        clock["t"] += s

    b = NominatimBackend(base_url=base + "/search", min_interval_s=1.0,
                         sleep=sleep, now=lambda: clock["t"])
    b("pusto, polska")
    clock["t"] += 0.4  # 0.6 s of the window remains
    b("pusto, polska")
    assert slept == [0.6]


def test_geocoder_actor_uses_backend_and_caches(server, ray_session,
                                                tmp_path):
    """GeocoderActor(backend_factory=…): misses ride the wire once,
    repeats hit the in-actor cache (no second request), and the
    persisted cache survives an actor restart (ST4)."""
    import ray

    from realestate_scraper_ray.stages.geo import GeocoderActor

    srv, base = server
    cache = str(tmp_path / "geo.json")

    def factory(base=base):
        return NominatimBackend(base_url=base + "/search",
                                min_interval_s=0.0, sleep=NOSLEEP)

    g = GeocoderActor.remote(cache_path=cache, backend_factory=factory)
    out1 = ray.get(g.lookup.remote(["wrzeszcz, gdańsk, polska"]))
    out2 = ray.get(g.lookup.remote(["wrzeszcz, gdańsk, polska"]))
    assert out1 == out2 and out1[0] is not None
    assert tuple(out1[0])[:2] == (54.37, 18.62)
    assert len(srv.seen) == 1  # second lookup never hit the wire
    ray.get(g.flush.remote())
    ray.kill(g)

    g2 = GeocoderActor.remote(cache_path=cache, backend_factory=factory)
    out3 = ray.get(g2.lookup.remote(["wrzeszcz, gdańsk, polska"]))
    assert [tuple(v) for v in out3] == [tuple(v) for v in out1]
    assert len(srv.seen) == 1  # warm from disk, still no wire call
    ray.kill(g2)


def test_geocoder_actor_never_caches_an_outage(ray_session):
    """GeocodeUnavailable from the backend answers None for THIS batch
    but is not cached — the same query re-geocodes once the backend is
    back, instead of being poisoned to a permanent miss."""
    import ray

    from realestate_scraper_ray.stages.geo import (
        GeocodeUnavailable, GeocoderActor, synthetic_geocode)

    class Flaky:
        def __init__(self):
            self.calls = 0

        def __call__(self, q):
            self.calls += 1
            if self.calls == 1:
                raise GeocodeUnavailable("outage")
            return synthetic_geocode(q, 11)

    g = GeocoderActor.remote(backend_factory=Flaky)
    q = "wrzeszcz, gdańsk, polska"
    assert ray.get(g.lookup.remote([q])) == [None]
    out2 = ray.get(g.lookup.remote([q]))
    assert out2[0] is not None          # retried: outage was NOT cached
    st = ray.get(g.stats.remote())
    assert st["misses"] == 2 and st["cached"] == 1
    ray.kill(g)
