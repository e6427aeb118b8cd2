"""Sitemap ingestion: sitemaps.org XML → frontier seed rows.

Real crawls bootstrap (and re-verify coverage of) their URL frontier
from the portals' sitemaps — the canonical-detail-page feed the
reference scraper never consumed (it discovers only by walking listing
pages). This stage adds that source Ray-Data-first:

- :func:`parse_sitemap` — stdlib-ElementTree parser for the two
  sitemaps.org document kinds (``<sitemapindex>`` of ``<sitemap><loc>``
  and ``<urlset>`` of ``<url><loc><lastmod?>``), namespace-tolerant
  (any or no xmlns), loud on any other root element.
- :func:`sitemap_entries` — the distributed expansion: a Dataset of
  per-host index URLs fans out through TWO actor-pool ``map_batches``
  stages (fetch+parse the index → chunk URLs; fetch+parse each chunk →
  entry rows), so chunk fetches parallelize across the pool exactly
  like page fetches in the crawl. The fetch callable is built once per
  actor in ``__init__`` (session / portal render cache), not per
  batch. ``min_lastmod`` (ISO date) pushes the recency filter into the
  chunk-parse stage — stale entries never leave the actor.
- :func:`frontier_from_sitemap` — entries → frontier-schema seed rows
  (kind ``offer``, detail priority, deterministic ``pos`` =
  chunk_idx * chunk_size + in-chunk position) consumable wherever a
  frontier table is (S6/S7 readers).

At 100 TB-scale (10^5 hosts × chunked sitemaps) the shape holds: the
index list is host-scale, each chunk is one bounded fetch+parse task,
and entries stream straight into the frontier without any driver
materialization.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable

import pyarrow as pa
import ray.data as rd

__all__ = ["parse_sitemap", "parse_robots_sitemaps", "sitemap_entries",
           "frontier_from_sitemap"]


def parse_robots_sitemaps(robots_txt: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt (RFC 9309 §2.3):
    group-independent, case-insensitive key, one absolute URL per
    line. Returns them in file order."""
    out = []
    for line in robots_txt.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(xml: str):
    """Parse one sitemap document.

    Returns ``("index", [chunk_url, ...])`` for a ``<sitemapindex>``,
    ``("urlset", [{"url": ..., "lastmod": str | None}, ...])`` for a
    ``<urlset>``. Raises ``ValueError`` on any other root element.
    """
    root = ET.fromstring(xml)
    kind = _local(root.tag)
    if kind == "sitemapindex":
        out = []
        for sm in root:
            if _local(sm.tag) != "sitemap":
                continue
            for c in sm:
                if _local(c.tag) == "loc" and c.text:
                    out.append(c.text.strip())
        return "index", out
    if kind == "urlset":
        entries = []
        for u in root:
            if _local(u.tag) != "url":
                continue
            loc, lastmod = None, None
            for c in u:
                if _local(c.tag) == "loc" and c.text:
                    loc = c.text.strip()
                elif _local(c.tag) == "lastmod" and c.text:
                    lastmod = c.text.strip()[:10]
            if loc:
                entries.append({"url": loc, "lastmod": lastmod})
        return "urlset", entries
    raise ValueError(f"not a sitemap document: root <{kind}>")


class _IndexExpand:
    """Actor-pool stage 1: index URL → chunk rows."""

    def __init__(self, fetch_factory: Callable[[], Callable[[str], str | None]]):
        self.fetch = fetch_factory()

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {"source": [], "region": [], "chunk_url": [],
                "chunk_idx": []}
        for src, reg, url in zip(t["source"].to_pylist(),
                                 t["region"].to_pylist(),
                                 t["url"].to_pylist()):
            xml = self.fetch(url)
            if xml is None:
                continue
            kind, chunks = parse_sitemap(xml)
            if kind != "index":
                raise ValueError(f"expected sitemapindex at {url}")
            for i, cu in enumerate(chunks):
                rows["source"].append(src)
                rows["region"].append(reg)
                rows["chunk_url"].append(cu)
                rows["chunk_idx"].append(i)
        return pa.table({"source": pa.array(rows["source"], pa.string()),
                         "region": pa.array(rows["region"], pa.string()),
                         "chunk_url": pa.array(rows["chunk_url"], pa.string()),
                         "chunk_idx": pa.array(rows["chunk_idx"], pa.int64())})


class _ChunkParse:
    """Actor-pool stage 2: chunk URL → entry rows (lastmod-filtered)."""

    def __init__(self, fetch_factory, min_lastmod: str | None):
        self.fetch = fetch_factory()
        self.min_lastmod = min_lastmod

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {"source": [], "region": [], "url": [], "lastmod": [],
                "chunk_idx": [], "pos": []}
        for src, reg, cu, ci in zip(t["source"].to_pylist(),
                                    t["region"].to_pylist(),
                                    t["chunk_url"].to_pylist(),
                                    t["chunk_idx"].to_pylist()):
            xml = self.fetch(cu)
            if xml is None:
                continue
            kind, entries = parse_sitemap(xml)
            if kind != "urlset":
                raise ValueError(f"expected urlset at {cu}")
            for pos, e in enumerate(entries):
                # ISO dates compare lexicographically; entries without
                # lastmod survive any recency filter (unknown age)
                if (self.min_lastmod is not None
                        and e["lastmod"] is not None
                        and e["lastmod"] < self.min_lastmod):
                    continue
                rows["source"].append(src)
                rows["region"].append(reg)
                rows["url"].append(e["url"])
                rows["lastmod"].append(e["lastmod"])
                rows["chunk_idx"].append(ci)
                rows["pos"].append(pos)
        return pa.table({
            "source": pa.array(rows["source"], pa.string()),
            "region": pa.array(rows["region"], pa.string()),
            "url": pa.array(rows["url"], pa.string()),
            "lastmod": pa.array(rows["lastmod"], pa.string()),
            "chunk_idx": pa.array(rows["chunk_idx"], pa.int64()),
            "pos": pa.array(rows["pos"], pa.int64())})


def sitemap_entries(fetch_factory, index_rows: list[dict], *,
                    min_lastmod: str | None = None,
                    concurrency: int = 4) -> rd.Dataset:
    """Distributed two-level sitemap expansion.

    ``index_rows``: ``[{"source", "region", "url"}, ...]`` — one row
    per host index document (host-scale, tiny). ``fetch_factory`` is
    called once per ACTOR to build the fetch callable (portal render /
    HTTP session). Returns a Dataset of
    ``(source, region, url, lastmod, chunk_idx, pos)``.
    """
    idx = rd.from_arrow(pa.table({
        "source": pa.array([r["source"] for r in index_rows], pa.string()),
        "region": pa.array([r["region"] for r in index_rows], pa.string()),
        "url": pa.array([r["url"] for r in index_rows], pa.string())}))
    # spread index rows so chunk fetches fan out across the pool;
    # autoscaling pools (min 1 actor) — a fixed min of `concurrency`
    # actors across two pools can deadlock a small CPU budget
    nblk = max(1, min(len(index_rows), concurrency * 4))
    chunks = idx.repartition(nblk).map_batches(
        _IndexExpand, fn_constructor_args=(fetch_factory,),
        batch_format="pyarrow", concurrency=(1, concurrency),
        num_cpus=0.5)
    return chunks.map_batches(
        _ChunkParse, fn_constructor_args=(fetch_factory, min_lastmod),
        batch_format="pyarrow", concurrency=(1, concurrency),
        num_cpus=0.5, batch_size=8)


def frontier_from_sitemap(entries: rd.Dataset,
                          chunk_size: int = 200) -> rd.Dataset:
    """Entries → frontier-schema seed rows: detail pages at offer
    priority with a deterministic global position per region."""

    def to_frontier(t: pa.Table) -> pa.Table:
        import numpy as np
        n = t.num_rows
        pos = (t["chunk_idx"].to_numpy(zero_copy_only=False) * chunk_size
               + t["pos"].to_numpy(zero_copy_only=False))
        return pa.table({
            "url": t["url"], "source": t["source"], "region": t["region"],
            "kind": pa.array(["offer"] * n, pa.string()),
            "priority": pa.array(np.ones(n, np.int64)),
            "page_idx": pa.array(np.zeros(n, np.int64)),
            "pos": pa.array(pos.astype(np.int64))})

    return entries.map_batches(to_frontier, batch_format="pyarrow")
