"""Real-HTTP transport (stages/http.py + CrawlConfig.http_fetch): the
reference HttpClient's semantics (core/http.py) exercised against a
local in-process HTTP server — 200 with headers, conditional-GET 304,
redirect follow, 5xx retry-to-success, 429 + Retry-After honoring with
the politeness hook, retry-budget exhaustion — and an end-to-end crawl
whose every page rides the wire yet equals the in-process html-mode
crawl byte-for-byte."""

import dataclasses
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from realestate_scraper_ray.config import CrawlConfig, PortalConfig
from realestate_scraper_ray.stages.http import (HttpResponse, HttpSession,
                                                HttpStatusError)

NOSLEEP = lambda *_: None  # noqa: E731


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # silence
        pass

    def _send(self, status, body=b"", headers=()):
        self.send_response(status)
        for k, v in headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def do_HEAD(self):
        self.do_GET()

    def do_GET(self):
        srv = self.server
        srv.seen.append((self.path, dict(self.headers)))
        n = srv.hits[self.path] = srv.hits.get(self.path, 0) + 1
        if self.path == "/ok":
            if self.headers.get("If-None-Match") == '"v1"':
                self._send(304, headers=[("ETag", '"v1"')])
            else:
                self._send(200, b"hello", [("ETag", '"v1"'),
                                           ("Content-Type", "text/html")])
        elif self.path == "/redirect":
            self._send(302, headers=[("Location", "/ok")])
        elif self.path == "/flaky":
            if n < 3:
                self._send(500, b"boom")
            else:
                self._send(200, b"recovered")
        elif self.path == "/throttle":
            if n == 1:
                self._send(429, headers=[("Retry-After", "0.25")])
            else:
                self._send(200, b"eased")
        elif self.path == "/gone":
            self._send(404, b"nope")
        else:
            self._send(200, b"fallthrough")


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.hits, srv.seen = {}, []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _session(**kw) -> HttpSession:
    kw.setdefault("sleep", NOSLEEP)
    kw.setdefault("jitter", lambda: 0.0)
    return HttpSession("test-agent/1.0", **kw)


def test_get_sends_session_headers(server):
    srv, base = server
    resp = _session().get(base + "/ok", accept="text/html")
    assert (resp.status, resp.body, resp.etag) == (200, b"hello", '"v1"')
    hdrs = srv.seen[-1][1]
    assert hdrs["User-Agent"] == "test-agent/1.0"
    assert hdrs["Accept-Language"].startswith("pl-PL")
    assert hdrs["Accept"] == "text/html"


def test_conditional_get_304(server):
    _, base = server
    s = _session()
    assert s.get(base + "/ok", etag='"v1"').status == 304
    assert s.get(base + "/ok", etag='"stale"').status == 200


def test_redirect_followed(server):
    _, base = server
    resp = _session().get(base + "/redirect")
    assert resp.status == 200 and resp.body == b"hello"
    assert resp.url.endswith("/ok")


def test_5xx_retries_to_success(server):
    srv, base = server
    slept = []
    resp = _session(sleep=slept.append).get(base + "/flaky")
    assert resp.status == 200 and resp.body == b"recovered"
    assert srv.hits["/flaky"] == 3
    # exponential backoff between the two failures (initial 1s, then 2s)
    assert slept == [1.0, 2.0]


def test_retry_after_honored_and_reported(server):
    srv, base = server
    slept, throttled = [], []
    s = _session(sleep=slept.append,
                 on_throttle=lambda h, d: throttled.append((h, d)))
    resp = s.get(base + "/throttle")
    assert resp.status == 200 and srv.hits["/throttle"] == 2
    # the server's hint was slept verbatim, then normal backoff
    assert slept[0] == 0.25
    assert throttled == [(f"127.0.0.1:{srv.server_address[1]}", 0.25)]


def test_retry_budget_exhausted_raises(server):
    srv, base = server
    s = _session(attempts=3)
    with pytest.raises(HttpStatusError) as ei:
        s.get(base + "/gone")
    assert ei.value.status == 404
    assert srv.hits["/gone"] == 3


def test_head_no_body(server):
    srv, base = server
    resp = _session().head(base + "/ok")
    assert resp.status == 200 and resp.body == b""
    assert resp.mime == "text/html"


def test_connection_error_raises_after_retries():
    s = _session(attempts=2)
    with pytest.raises(Exception):
        s.get("http://127.0.0.1:1/unreachable")  # port 1: refused
    assert s.n_requests == 2


# -- end-to-end: the crawl engine over a real local HTTP gateway ------------


class _PortalGateway(BaseHTTPRequestHandler):
    """Serves the synthetic portal's HTML (and robots.txt / ETags) for
    gateway-encoded URLs, so the whole crawl rides real sockets."""

    protocol_version = "HTTP/1.1"
    portal = None  # set by the fixture

    def log_message(self, *a):
        pass

    def _send(self, status, body=b"", headers=()):
        self.send_response(status)
        for k, v in headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urllib.parse.unquote(self.path.lstrip("/"))
        if url.endswith("/robots.txt"):
            host = urllib.parse.urlsplit(url).netloc
            self._send(200, self.portal.robots_txt(host).encode(),
                       [("Content-Type", "text/plain")])
            return
        html = self.portal.render_html(url)
        if html is None:
            self._send(404)
            return
        etag = self.portal.etag(url)
        hdrs = [("Content-Type", "text/html; charset=utf-8")]
        if etag:
            hdrs.append(("ETag", etag))
            if self.headers.get("If-None-Match") == etag:
                self._send(304, headers=hdrs)
                return
        self._send(200, html.encode(), hdrs)


PCFG = PortalConfig(regions=("pomorskie",), base_pages=2,
                    page_size_scale=0.12, html_bytes=6000)
CRAWL = CrawlConfig(urlseen_shards=2, urlseen_capacity=1 << 14,
                    fetch_batch_size=64, fetch_concurrency=2,
                    politeness_shards=2, validators=True)


@pytest.fixture(scope="module")
def gateway():
    from realestate_scraper_ray.sources.synth_portal import Portal
    handler = type("GW", (_PortalGateway,), {"portal": Portal(PCFG)})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _sorted_tbl(res, name, keys):
    df = res.table(name).to_pandas()
    return df[sorted(df.columns)].sort_values(keys).reset_index(drop=True)


def test_crawl_over_http_equals_local(gateway, tmp_path_factory,
                                      ray_session):
    """Every page of this crawl crosses a real socket (gateway-encoded
    GETs, real robots.txt, real ETag headers) — and the output tables
    equal the in-process html-mode crawl byte-for-byte."""
    from realestate_scraper_ray.pipelines.crawl import run_crawl

    wd_local = str(tmp_path_factory.mktemp("http_local"))
    res_local = run_crawl(PCFG, CRAWL, wd_local)

    hcfg = dataclasses.replace(CRAWL, http_fetch=True,
                               http_rewrite_base=gateway,
                               http_backoff_initial=0.01)
    wd_http = str(tmp_path_factory.mktemp("http_wire"))
    res_http = run_crawl(PCFG, hcfg, wd_http)

    for name, keys in (("offers", ["url"]), ("photos", ["offer_id", "seq"])):
        pd.testing.assert_frame_equal(_sorted_tbl(res_local, name, keys),
                                      _sorted_tbl(res_http, name, keys))
    assert res_http.pages_fetched == res_local.pages_fetched

    # revisit over the wire: If-None-Match → real 304s, zero re-parses
    rcfg = dataclasses.replace(hcfg, validators_from=wd_http)
    wd_rev = str(tmp_path_factory.mktemp("http_revisit"))
    res_rev = run_crawl(PCFG, rcfg, wd_rev)
    pd.testing.assert_frame_equal(_sorted_tbl(res_local, "offers", ["url"]),
                                  _sorted_tbl(res_rev, "offers", ["url"]))
    assert res_rev.offers == 0  # every detail page answered 304
