"""Sitemap ingestion: parser, portal documents, distributed expansion
vs a sequential walk, recency pushdown, frontier seeding."""

import datetime

import pytest

from realestate_scraper_ray.config import PortalConfig
from realestate_scraper_ray.sources.synth_portal import (
    PORTAL_TODAY_ORD, Portal,
)
from realestate_scraper_ray.stages.sitemap import (
    frontier_from_sitemap, parse_sitemap, sitemap_entries,
)

PCFG = PortalConfig(regions=("pomorskie", "mazowieckie"), base_pages=2,
                    page_size_scale=0.3)


def _index_rows(portal):
    return [{"source": s, "region": r,
             "url": portal.sitemap_index_url(s, r)}
            for s in portal.cfg.sources for r in portal.cfg.regions]


def _seq_walk(portal, min_lastmod=None):
    """Sequential oracle: the same two-level walk in plain Python."""
    out = []
    for row in _index_rows(portal):
        kind, chunks = parse_sitemap(portal.render_sitemap(row["url"]))
        assert kind == "index"
        for ci, cu in enumerate(chunks):
            kind2, entries = parse_sitemap(portal.render_sitemap(cu))
            assert kind2 == "urlset"
            for pos, e in enumerate(entries):
                if (min_lastmod is not None and e["lastmod"] is not None
                        and e["lastmod"] < min_lastmod):
                    continue
                out.append((row["source"], row["region"], e["url"],
                            e["lastmod"], ci, pos))
    return sorted(out)


def test_parse_sitemap_kinds_and_namespaces():
    idx = """<?xml version="1.0"?>
    <sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc> https://h/s-0.xml </loc></sitemap>
      <sitemap><loc>https://h/s-1.xml</loc></sitemap>
    </sitemapindex>"""
    kind, chunks = parse_sitemap(idx)
    assert kind == "index" and chunks == ["https://h/s-0.xml",
                                          "https://h/s-1.xml"]
    # no namespace + missing lastmod tolerated
    us = """<urlset><url><loc>https://h/a</loc></url>
            <url><loc>https://h/b</loc><lastmod>2026-01-31T10:00:00+00:00
            </lastmod></url></urlset>"""
    kind, entries = parse_sitemap(us)
    assert kind == "urlset"
    assert entries == [{"url": "https://h/a", "lastmod": None},
                       {"url": "https://h/b", "lastmod": "2026-01-31"}]
    with pytest.raises(ValueError):
        parse_sitemap("<html><body>nope</body></html>")


def test_portal_sitemap_documents():
    portal = Portal(PCFG)
    url = portal.sitemap_index_url("otodom", "pomorskie")
    kind, chunks = parse_sitemap(portal.render_sitemap(url))
    assert kind == "index" and len(chunks) >= 1
    kind2, entries = parse_sitemap(portal.render_sitemap(chunks[0]))
    assert kind2 == "urlset" and len(entries) > 0
    # every listed URL is the plain public offer URL of a direct k,
    # and lastmod matches the portal's posted date
    ks = portal.sitemap_direct_ks("otodom", "pomorskie")
    assert [e["url"] for e in entries] == [
        portal.offer_url("otodom", "pomorskie", k)
        for k in ks[:portal.SITEMAP_CHUNK]]
    for e, k in zip(entries, ks):
        d = datetime.date.fromordinal(
            PORTAL_TODAY_ORD
            - portal.posted_days_ago("otodom", "pomorskie", k))
        assert e["lastmod"] == d.isoformat()
    # unknown host / bad chunk index serve nothing
    assert portal.render_sitemap("https://nope.example.pl/sitemap-x.xml") is None
    assert portal.render_sitemap(
        portal.sitemap_chunk_url("otodom", "pomorskie", 999)) is None


def test_distributed_equals_sequential(ray_session):
    portal = Portal(PCFG)
    ds = sitemap_entries(lambda: Portal(PCFG).render_sitemap,
                         _index_rows(portal))
    got = sorted((r["source"], r["region"], r["url"], r["lastmod"],
                  r["chunk_idx"], r["pos"]) for r in ds.take_all())
    assert got == _seq_walk(portal)
    assert len(got) > 0


def test_min_lastmod_pushdown(ray_session):
    portal = Portal(PCFG)
    cutoff = (datetime.date.fromordinal(PORTAL_TODAY_ORD)
              - datetime.timedelta(days=15)).isoformat()
    ds = sitemap_entries(lambda: Portal(PCFG).render_sitemap,
                         _index_rows(portal), min_lastmod=cutoff)
    got = sorted((r["source"], r["region"], r["url"], r["lastmod"],
                  r["chunk_idx"], r["pos"]) for r in ds.take_all())
    exp = _seq_walk(portal, min_lastmod=cutoff)
    assert got == exp
    assert 0 < len(got) < len(_seq_walk(portal))  # filter really bit
    assert all(e[3] >= cutoff for e in got)


def test_frontier_seed_rows(ray_session):
    portal = Portal(PCFG)
    ds = sitemap_entries(lambda: Portal(PCFG).render_sitemap,
                         _index_rows(portal))
    fr = frontier_from_sitemap(ds, chunk_size=portal.SITEMAP_CHUNK)
    rows = fr.take_all()
    assert {r["kind"] for r in rows} == {"offer"}
    assert all(r["priority"] == 1 and r["page_idx"] == 0 for r in rows)
    # pos is globally unique and ordered per (source, region)
    per = {}
    for r in rows:
        per.setdefault((r["source"], r["region"]), []).append(r["pos"])
    for poss in per.values():
        assert len(poss) == len(set(poss))
    # every sitemap URL classifies as a plain offer page
    for r in rows[:50]:
        assert portal.classify(r["url"]).kind == "offer"


def test_robots_sitemap_directives():
    from realestate_scraper_ray.stages.sitemap import parse_robots_sitemaps
    portal = Portal(PCFG)
    txt = portal.robots_txt(portal.host("otodom", "pomorskie"))
    sms = parse_robots_sitemaps(txt)
    assert sms == [portal.sitemap_index_url("otodom", "pomorskie")]
    # shared trojmiasto host advertises one sitemap per region
    tm = parse_robots_sitemaps(
        portal.robots_txt("ogloszenia.trojmiasto.pl"))
    assert sorted(tm) == sorted(
        portal.sitemap_index_url("trojmiasto", r) for r in PCFG.regions)
    # parser: case-insensitive key, comments, junk lines
    assert parse_robots_sitemaps(
        "User-agent: *\nSITEMAP: https://h/s.xml # note\nnope\n"
        "sitemap:https://h/t.xml\n") == ["https://h/s.xml",
                                         "https://h/t.xml"]


def test_robots_matcher_tolerates_sitemap_lines():
    """The REP matcher must ignore the group-independent Sitemap lines
    (RFC 9309: unknown/other records do not break groups)."""
    from realestate_scraper_ray.state.robots import parse_robots_policy
    portal = Portal(PCFG)
    txt = portal.robots_txt(portal.host("otodom", "pomorskie"))
    pol = parse_robots_policy(txt)
    assert not pol.allowed("/private/x")
    assert pol.allowed("/pl/oferta/mieszkanie-pomorskie-1-ID1000000001")
