"""Crawler-trap guard: URL-shape caps vs an infinite session-id trap.

The reference has no trap defense (its listing walks are bounded by
max-pages / no-new auto-stops and it never expands links from detail
pages), but a distributed frontier at 10^10-URL scale MUST have one:
calendar/session-id traps mint unbounded NEW urls, so exact URL dedup
admits every hop forever. The guard (CrawlConfig.max_url_len /
max_query_params / max_path_depth, stages/fetch.py trap_like) cuts
such chains at link-extraction time — before per-page dedup, robots,
or the URL-seen shards ever see them.
"""

import pandas as pd
import pytest

from realestate_scraper_ray.config import CrawlConfig, PortalConfig
from realestate_scraper_ray.pipelines.crawl import run_crawl
from realestate_scraper_ray.pipelines.oracle import crawl_oracle
from realestate_scraper_ray.sources.synth_portal import TRAP_K_BASE, Portal
from realestate_scraper_ray.stages.fetch import trap_like

PCFG = PortalConfig(regions=("pomorskie", "mazowieckie"), base_pages=3,
                    page_size_scale=0.3, trap_per_mille=80)
GUARD = CrawlConfig(urlseen_shards=4, urlseen_capacity=1 << 14,
                    fetch_batch_size=64, max_query_params=3)


def test_trap_like_each_cap_trips_individually():
    base = "https://h.example.pl/a/b/c?x=1&y=2&z=3"
    off = CrawlConfig()
    assert not trap_like(base, off)  # all caps default off
    assert trap_like(base, CrawlConfig(max_url_len=20))
    assert not trap_like(base, CrawlConfig(max_url_len=200))
    assert trap_like(base, CrawlConfig(max_query_params=2))
    assert not trap_like(base, CrawlConfig(max_query_params=3))
    assert trap_like(base, CrawlConfig(max_path_depth=2))
    assert not trap_like(base, CrawlConfig(max_path_depth=3))
    # no query string → param cap can't trip; path cap still counts
    assert not trap_like("https://h.pl/a/b", CrawlConfig(max_query_params=1))
    assert trap_like("https://h.pl/a/b/c/d", CrawlConfig(max_path_depth=3))


def test_trap_chain_is_unbounded_without_guard():
    """Every hop of a trap chain is a fresh never-seen URL that
    classifies as a followable page — exact URL dedup alone can never
    terminate it."""
    portal = Portal(PCFG)
    url = portal.trap_url("pomorskie", TRAP_K_BASE + 123)
    seen = set()
    for _ in range(40):
        assert url not in seen
        seen.add(url)
        ref = portal.classify(url)
        assert ref.kind == "investment"  # indistinguishable by grammar
        spans = portal.render(url)
        assert len(spans) == 1 and spans[0]["kind"] == "link"
        url = spans[0]["media_ref"]
    assert len(seen) == 40


def test_guarded_crawl_terminates_and_matches_oracle(tmp_path, ray_session):
    """On a trap-seeded portal the guarded engine terminates, matches
    the (same-guard) sequential oracle exactly, never admits a trapped
    URL to the frontier, and persists the trapped audit trail."""
    res = run_crawl(PCFG, GUARD, str(tmp_path / "wd"))
    orc = crawl_oracle(Portal(PCFG), GUARD)
    got = set(res.table("urls")["offer_url"].to_pylist())
    assert got == {r["offer_url"] for r in orc.urls}
    go = (res.table("offers").to_pandas()
          .sort_values(["source", "region", "page_idx", "pos"])
          .reset_index(drop=True))
    eo = (pd.DataFrame(orc.offers)
          .sort_values(["source", "region", "page_idx", "pos"])
          .reset_index(drop=True))
    assert go["offer_id"].tolist() == eo["offer_id"].tolist()
    pd.testing.assert_series_equal(go["price_amount"],
                                   eo["price_amount"], check_names=False)
    trapped = res.table("trapped").to_pandas()
    assert len(trapped) > 0
    assert (trapped["url"].str.count("&sid=") >= GUARD.max_query_params - 1).all()
    # trapped URLs never reached the frontier
    frontier_urls = set(res.table("urls")["offer_url"].to_pylist())
    assert not (set(trapped["url"]) & frontier_urls)


def test_deeper_cap_crawls_deeper_same_offers(tmp_path, ray_session):
    """Loosening the cap follows each chain further (more trapped rows
    at a deeper depth, more pages fetched) but never changes the offer
    output — trap pages contain no offers."""
    shallow = run_crawl(PCFG, GUARD, str(tmp_path / "s"))
    deep_cfg = CrawlConfig(urlseen_shards=4, urlseen_capacity=1 << 14,
                           fetch_batch_size=64, max_query_params=6)
    deep = run_crawl(PCFG, deep_cfg, str(tmp_path / "d"))
    assert deep.pages_fetched > shallow.pages_fetched
    sd = shallow.table("trapped").to_pandas()
    dd = deep.table("trapped").to_pandas()
    assert len(sd) and len(dd)
    assert dd["url"].str.count("&sid=").min() > sd["url"].str.count("&sid=").min()
    so = (shallow.table("offers").to_pandas()
          .sort_values(["source", "region", "page_idx", "pos"])
          .reset_index(drop=True))
    do = (deep.table("offers").to_pandas()
          .sort_values(["source", "region", "page_idx", "pos"])
          .reset_index(drop=True))
    pd.testing.assert_frame_equal(so, do)


def test_trap_free_portal_unchanged_by_guard(tmp_path, ray_session):
    """On a clean portal the guard is inert: guarded and unguarded runs
    produce identical tables and an empty trapped trail."""
    clean = PortalConfig(regions=("pomorskie",), base_pages=3,
                         page_size_scale=0.3)
    a = run_crawl(clean, GUARD, str(tmp_path / "a"))
    b = run_crawl(clean, CrawlConfig(urlseen_shards=4,
                                     urlseen_capacity=1 << 14,
                                     fetch_batch_size=64),
                  str(tmp_path / "b"))
    assert a.table("trapped").num_rows == 0
    for name in ("urls", "offers", "photos"):
        ta = (a.table(name).to_pandas()
              .sort_values(["source", "region", "page_idx", "pos"]
                           if name != "photos" else ["offer_id", "seq"])
              .reset_index(drop=True))
        tb = (b.table(name).to_pandas()
              .sort_values(["source", "region", "page_idx", "pos"]
                           if name != "photos" else ["offer_id", "seq"])
              .reset_index(drop=True))
        pd.testing.assert_frame_equal(ta, tb, obj=name)


def test_trap_guard_html_mode(tmp_path, ray_session):
    """The guard holds in html mode too: trap pages render as real
    otodom markup, the extractor chain re-discovers the chain links,
    and the guarded html crawl equals the guarded span crawl."""
    hcfg = PortalConfig(regions=("pomorskie",), base_pages=3,
                        page_size_scale=0.3, trap_per_mille=80,
                        html_bytes=4000)
    scfg = PortalConfig(regions=("pomorskie",), base_pages=3,
                        page_size_scale=0.3, trap_per_mille=80)
    h = run_crawl(hcfg, GUARD, str(tmp_path / "h"))
    s = run_crawl(scfg, GUARD, str(tmp_path / "s"))
    assert set(h.table("urls")["offer_url"].to_pylist()) == \
        set(s.table("urls")["offer_url"].to_pylist())
    assert h.table("trapped").num_rows == s.table("trapped").num_rows > 0
