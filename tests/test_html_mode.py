"""HTML fetch+parse mode (PortalConfig.html_bytes > 0): pages render as
realistic HTML/JSON documents and the fetch stage recovers the span
document through the regex/JSON extractor chain (stages/fetch.py
``html_to_spans`` — the analogue of the reference's __NEXT_DATA__ +
CSS parsers, otodom.py:57-190, 315-376). The crawl outputs must be
identical to span mode — this ties the bench configuration (which runs
in html mode) to the correctness gate."""

import pandas as pd

from realestate_scraper_ray.config import CrawlConfig, PortalConfig
from realestate_scraper_ray.pipelines.crawl import run_crawl
from realestate_scraper_ray.sources.synth_portal import Portal
from realestate_scraper_ray.stages.fetch import html_to_spans

SPAN_CFG = PortalConfig(regions=("pomorskie", "mazowieckie"),
                        base_pages=2, page_size_scale=0.15)
HTML_CFG = PortalConfig(regions=("pomorskie", "mazowieckie"),
                        base_pages=2, page_size_scale=0.15, html_bytes=6000)
CRAWL = CrawlConfig(urlseen_shards=4, urlseen_capacity=1 << 14,
                    fetch_batch_size=64)


def _norm(spans):
    # link/image spans must round-trip exactly (media_ref + order)
    return sorted((s["kind"], s["media_ref"], s["offset"])
                  for s in spans if s["kind"] != "text")


def _parsed(spans):
    # text spans round-trip at the parsed-offer level: the LD/NEXT/CSS
    # chain yields normalized value strings ('499000.0' vs '499000 zł'),
    # which coerce identically — parse_offer_spans is the invariant
    from realestate_scraper_ray.pipelines.oracle import parse_offer_spans
    return parse_offer_spans(spans)


def test_html_roundtrip_all_sources_and_kinds():
    span_p, html_p = Portal(SPAN_CFG), Portal(HTML_CFG)
    for src in ("otodom", "gratka", "morizon", "trojmiasto"):
        lst = span_p.listing_url(src, "pomorskie", 1)
        assert _norm(span_p.render(lst)) == _norm(html_to_spans(html_p.render_html(lst), lst))
        offer_urls = [s["media_ref"] for s in span_p.render(lst)
                      if span_p.classify(s["media_ref"]).kind == "offer"]
        for u in offer_urls[:5]:
            got = html_to_spans(html_p.render_html(u), u)
            exp = span_p.render(u)
            assert _parsed(got) == _parsed(exp), u
            assert _norm(got) == _norm(exp), u  # photo spans exact
    inv = html_p.investment_url("pomorskie", 3)
    assert _norm(span_p.render(inv)) == _norm(html_to_spans(html_p.render_html(inv), inv))


def _facts_scan(portal, flag, n=1200):
    for k in range(n):
        f = portal.offer_facts("otodom", "pomorskie", k)
        if f[flag]:
            yield k, f


def test_banner_price_recovered_on_regular_pages():
    """otodom banner-price path (otodom.py:111-118): price_amount absent
    from LD+JSON and NEXT params, served only in the header price node —
    the extractor must recover it (and the parsed offer must equal span
    mode)."""
    span_p, html_p = Portal(SPAN_CFG), Portal(HTML_CFG)
    from realestate_scraper_ray.pipelines.oracle import parse_offer_spans
    seen = 0
    for k, f in _facts_scan(span_p, "banner_price"):
        u = span_p.offer_url("otodom", "pomorskie", k)
        html = html_p.render_html(u)
        # price really absent from the structured surfaces
        assert f'"price_amount","{f["price"]:.0f} zł"' not in html
        got = parse_offer_spans(html_to_spans(html, u))
        assert got == parse_offer_spans(span_p.render(u))
        assert got[0]["price_amount"] == f["price"]
        seen += 1
    assert seen > 3


def test_multiunit_banner_price_suppressed():
    """M9 multi-unit guard (otodom.py:86-87,111-119): pages with
    paginatedUnits/developmentData in pageProps must never take
    price_amount from the banner's decoy 'od ... zł' figure; the offer
    falls back to the derived (ppm2-based) price like ppm2_only."""
    span_p, html_p = Portal(SPAN_CFG), Portal(HTML_CFG)
    from realestate_scraper_ray.pipelines.oracle import parse_offer_spans
    seen = 0
    for k, f in _facts_scan(span_p, "multiunit"):
        u = span_p.offer_url("otodom", "pomorskie", k)
        html = html_p.render_html(u)
        assert "paginatedUnits" in html or "developmentData" in html
        assert "od 999 000 zł" in html  # the decoy banner is present
        spans = html_to_spans(html, u)
        fields = dict(s["text"].split("=", 1)
                      for s in spans if s["kind"] == "text")
        assert "price_amount" not in fields  # banner suppressed
        got = parse_offer_spans(spans)
        assert got == parse_offer_spans(span_p.render(u))
        assert got[0]["price_amount"] != 999000.0
        seen += 1
    assert seen > 3


def test_banner_without_multiunit_marker_is_taken():
    """Control for the guard: the same decoy banner WITHOUT the
    multi-unit marker would set price_amount — proving the suppression
    comes from the pageProps markers, not from ignoring banners."""
    html = ('<html><body>'
            '<script id="__NEXT_DATA__" type="application/json">'
            '{"props":{"pageProps":{"ad":{"id":"x","params":[],"images":[]}}}}'
            '</script>'
            '<div data-cy="adPageHeader-price">od 999 000 zł</div>'
            '</body></html>')
    u = "https://www.otodom.pl/pl/oferta/mieszkanie-x-ID1"
    fields = dict(s["text"].split("=", 1)
                  for s in html_to_spans(html, u) if s["kind"] == "text")
    assert fields.get("price_amount") == "999000.0"
    # and with the marker, the identical page suppresses it
    html_mu = html.replace(
        ',"images":[]}', ',"images":[]},"paginatedUnits":[{"id":1}]')
    fields = dict(s["text"].split("=", 1)
                  for s in html_to_spans(html_mu, u) if s["kind"] == "text")
    assert "price_amount" not in fields


def test_next_data_path_used_for_otodom():
    html_p = Portal(HTML_CFG)
    u = html_p.offer_url("otodom", "pomorskie", 1)
    assert "__NEXT_DATA__" in html_p.render_html(u)
    u = html_p.offer_url("gratka", "pomorskie", 1)
    assert "__NEXT_DATA__" not in html_p.render_html(u)
    assert 'class="param"' in html_p.render_html(u)


def test_html_mode_crawl_equals_span_mode(tmp_path, ray_session):
    a = run_crawl(SPAN_CFG, CRAWL, str(tmp_path / "span"))
    b = run_crawl(HTML_CFG, CRAWL, str(tmp_path / "html"))
    for name in ("urls", "offers", "photos"):
        ta = a.table(name).to_pandas()
        tb = b.table(name).to_pandas()
        ta = ta.sort_values(list(ta.columns)).reset_index(drop=True)
        tb = tb.sort_values(list(tb.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(ta, tb, obj=name)
    assert a.state == b.state


def test_table_backed_fetch_equals_procedural(tmp_path, ray_session):
    # the input_hint substrate: crawl served from a materialized
    # (doc_id, spans) parquet — must equal the procedural-render crawl
    import dataclasses
    docs_path = str(tmp_path / "documents.parquet")
    Portal(SPAN_CFG).write_documents(docs_path)
    table_cfg = dataclasses.replace(SPAN_CFG, documents_path=docs_path)
    a = run_crawl(SPAN_CFG, CRAWL, str(tmp_path / "proc"))
    b = run_crawl(table_cfg, CRAWL, str(tmp_path / "tab"))
    for name in ("urls", "offers", "photos"):
        ta = a.table(name).to_pandas()
        tb = b.table(name).to_pandas()
        ta = ta.sort_values(list(ta.columns)).reset_index(drop=True)
        tb = tb.sort_values(list(tb.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(ta, tb, obj=name)
    assert a.state == b.state


def test_crawl_html_mode_query_equals_span_mode(ray_session):
    """The driver-visible crawl_html_mode query is SELF-verifying
    since r5: it compares the html-mode crawl against the span-walk
    sequential oracle in-process and returns the comparison rows
    (raising on divergence). The test asserts the verification ran
    green over non-trivial tables."""
    from realestate_scraper_ray.pipelines.relational import QUERIES
    out = QUERIES["crawl_html_mode"]("unused")
    assert sorted(out["table"]) == ["offers", "photos", "urls"]
    assert (out["n_mismatch"] == 0).all()
    assert (out["rows_engine"] == out["rows_oracle"]).all()
    assert int(out.loc[out["table"] == "offers", "rows_engine"].iloc[0]) > 100
