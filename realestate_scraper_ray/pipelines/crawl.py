"""The crawl pipeline: frontier generation loop over Ray Data.

Architecture (SURVEY.md §7.1): per generation ("wave"), ONE streamed
Ray Data execution does everything row-shaped:

    frontier/gen=G ──read_parquet (uniform blocks, priority-ordered
                     paths: part-p0-… pagination streams first)──▶
      map_batches(wave):  fetch+parse (per-worker cached state:
                          politeness, robots, retries)
        ├─▶ offers  → workdir/offers/gen=G   (atomic fragments)
        ├─▶ photos  → workdir/photos/gen=G
        ├─▶ links   → cuckoo URL-seen shards (test-and-set) →
        │             first-seen rows → frontier/gen=G+1, written
        │             host-bucket-ordered with skew salting
        └─▶ returns per-batch summary rows only
      take_all (tiny) ─▶ driver folds per-region stop logic (auto-stop
        watermarks, SURVEY.md §2.9) → next pagination rows appended to
        frontier/gen=G+1
      checkpoint gen=G every `checkpoint_every` waves: region state +
        filter shard bytes (atomic dir rename); resume re-enters at the
        first unfinished wave and re-writes its outputs
        deterministically (replace-on-retry).

The driver holds only O(#regions) state: everything row-shaped flows
through the Dataset or per-generation parquet fragments; page bodies
never enter the object store (fetch and parse share a stage). At
10^10-URL scale a frontier window (split frontier/gen=G into
fixed-size sub-waves) bounds each execution — the loop is unchanged.

The golden ``urls`` table (reference urls.csv, otodom.py:620-625) is
derived from the frontier parquet (kind='detail' rows), not written
separately — the frontier IS the discovery log.

Reference lifecycle analogue: /root/reference/scrapper/cli.py:731-816
(live-all with resume/retry rounds) + pipelines/stream.py:140-157.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import threading
import uuid
from dataclasses import asdict, dataclass, field, replace

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

import zlib

import numpy as np

from ..config import CrawlConfig, PortalConfig
from ..functions.urls import extract_offer_ids, host_of
from ..sources.synth_portal import Portal
from ..stages.fetch import make_fetch_fn
from ..state.politeness import PolitenessService
from ..state.urlseen import UrlSeenService

FRONTIER_COLS = ["url", "kind", "priority", "source", "region", "page_idx", "pos"]
FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()), ("kind", pa.string()), ("priority", pa.int32()),
    ("source", pa.string()), ("region", pa.string()),
    ("page_idx", pa.int32()), ("pos", pa.int32())])
# the reference's wide 20-col offer schema (storage.py:13-20 + the
# posted_at/updated_at datetimes from the pydantic model,
# validate.py:9-50) plus the engine's order keys
OFFER_OUT_COLS = ["offer_id", "source", "url", "price_amount", "price_currency",
                  "price_per_m2", "city", "lat", "lon", "area_m2", "rooms",
                  "title", "district", "street", "description",
                  "floor", "floors",
                  "market_type", "property_type", "posted_at", "updated_at",
                  "first_seen", "last_seen",
                  "region", "page_idx", "pos"]
PHOTO_OUT_COLS = ["offer_id", "seq", "url"]

_SUMMARY_SCHEMA = pa.schema([
    # meta_count | offer_count | pag_meta | pag_link | inv_next | new_detail
    ("tag", pa.string()),
    ("source", pa.string()), ("region", pa.string()),
    ("status", pa.string()), ("page_idx", pa.int32()),
    ("n", pa.int64()), ("url", pa.string()),
    ("kind", pa.string()), ("priority", pa.int32()), ("pos", pa.int32())])


@dataclass
class RegionState:
    last_page_done: int = 0
    stop_reason: str = ""
    no_new_streak: int = 0
    fetched: int = 0
    parsed: int = 0
    failed: int = 0


@dataclass
class CrawlResult:
    workdir: str
    generations: int
    state: dict = field(default_factory=dict)   # "source|region" -> RegionState dict
    pages_fetched: int = 0
    pages_failed: int = 0
    offers: int = 0
    # --limit semantics (stream.py:145-149): the frontier is unaffected;
    # only the first `limit_offers` detail URLs *in global crawl order*
    # (source order, region order, page_idx, pos — the reference's
    # sequential emission order) yield offer/photo rows. Applied as a
    # deterministic truncation at table read; the crawl itself stays
    # wave-parallel.
    limit_offers: int | None = None
    source_order: tuple[str, ...] = ()
    region_order: tuple[str, ...] = ()

    def _read_gen_dirs(self, name: str) -> pa.Table | None:
        root = os.path.join(self.workdir, name)
        parts = []
        if os.path.isdir(root):
            for gen in sorted(os.listdir(root)):
                d = os.path.join(root, gen)
                if not os.path.isdir(d):
                    continue  # e.g. validators/meta.json
                for f in sorted(os.listdir(d)):
                    if f.endswith(".parquet"):
                        parts.append(pq.read_table(os.path.join(d, f)))
        return pa.concat_tables(parts, promote_options="default") if parts else None

    def _limited_urlset(self) -> set[str] | None:
        if self.limit_offers is None:
            return None
        u = self.table("urls").to_pandas()
        u["_s"] = u["source"].map({s: i for i, s in enumerate(self.source_order)})
        u["_r"] = u["region"].map({r: i for i, r in enumerate(self.region_order)})
        u = u.sort_values(["_s", "_r", "page_idx", "pos"], kind="stable")
        return set(u["offer_url"].head(self.limit_offers))

    def _gen_files(self, name: str) -> list[str]:
        root = os.path.join(self.workdir, name)
        out: list[str] = []
        if os.path.isdir(root):
            for gen in sorted(os.listdir(root)):
                d = os.path.join(root, gen)
                if not os.path.isdir(d):
                    continue  # e.g. validators/meta.json
                out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                           if f.endswith(".parquet"))
        return out

    def dataset(self, name: str) -> "rd.Dataset":
        """Streaming reader over the crawl output: a ``ray.data.Dataset``
        from the per-generation parquet fragments — the API downstream
        pipelines should consume (``table()`` is the test-scale
        verification twin that concatenates driver-side). 'urls' derives
        from the frontier's detail rows per batch; ``limit_offers`` is
        applied as a broadcast keep-set filter (the set is ≤ limit rows
        by construction, so broadcasting it is bounded)."""
        if name == "urls":
            files = self._gen_files("frontier")
            if not files:
                return rd.from_arrow(pa.table({}))

            def derive(t: pa.Table) -> pa.Table:
                d = t.filter(pc.equal(t["kind"], "detail"))
                return pa.table({
                    "offer_url": d["url"],
                    "offer_id": extract_offer_ids(d["url"].combine_chunks()),
                    "page_idx": d["page_idx"], "source": d["source"],
                    "region": d["region"], "pos": d["pos"]})

            return rd.read_parquet(files).map_batches(derive, batch_format="pyarrow")
        files = self._gen_files(name)
        if not files:
            return rd.from_arrow(pa.table({}))
        ds = rd.read_parquet(files)
        keep = self._limited_urlset()
        if keep is not None:
            import ray as _ray
            if name == "offers":
                keep_ref = _ray.put(pa.array(sorted(keep)))

                def lim(t: pa.Table) -> pa.Table:
                    return t.filter(pc.is_in(t["url"], value_set=_ray.get(keep_ref)))

                ds = ds.map_batches(lim, batch_format="pyarrow")
            elif name in ("photos", "media"):
                kept = self.table("offers")["offer_id"].combine_chunks()
                kept_ref = _ray.put(kept)

                def lim_p(t: pa.Table) -> pa.Table:
                    return t.filter(pc.is_in(t["offer_id"], value_set=_ray.get(kept_ref)))

                ds = ds.map_batches(lim_p, batch_format="pyarrow")
        return ds

    def table(self, name: str) -> pa.Table:
        """Read an output table: 'offers', 'photos', or the derived 'urls'."""
        if name == "urls":
            fr = self._read_gen_dirs("frontier")
            if fr is None:
                return pa.table({})
            d = fr.filter(pc.equal(fr["kind"], "detail"))
            return pa.table({
                "offer_url": d["url"],
                "offer_id": extract_offer_ids(d["url"].combine_chunks()),
                "page_idx": d["page_idx"], "source": d["source"],
                "region": d["region"], "pos": d["pos"]})
        t = self._read_gen_dirs(name)
        if t is None:
            return pa.table({})
        keep = self._limited_urlset()
        if keep is not None:
            if name == "offers":
                t = t.filter(pc.is_in(t["url"], value_set=pa.array(list(keep))))
            elif name in ("photos", "media"):
                kept_offers = self.table("offers")["offer_id"]
                t = t.filter(pc.is_in(t["offer_id"], value_set=kept_offers.combine_chunks()))
        return t


def _filter_kind(t: pa.Table, kind: str) -> pa.Table:
    return t.filter(pc.equal(t["rec_kind"], kind))


def _links_of(t: pa.Table, kinds: list[str]) -> pa.Table:
    links = _filter_kind(t, "link")
    return links.filter(pc.is_in(links["kind"], value_set=pa.array(kinds)))


_FRAG_COUNTER = itertools.count()
# per-worker-process token: pids alone are NOT unique across the nodes
# of a `ray job submit` cluster sharing one --workdir, so a pid+counter
# fragment name could silently overwrite another node's fragment
_FRAG_TOKEN = uuid.uuid4().hex[:8]
_READ_LOCK = threading.Lock()


def _host_buckets(urls: pa.Array | pa.ChunkedArray, cfg: CrawlConfig) -> np.ndarray:
    """Frontier partition key: hash(host) + per-URL salt for skewed
    hosts (SURVEY.md §7.4). A host matching a ``skew_salts`` substring
    spreads over N buckets; others map to one. Buckets order fragment
    writes — the shuffle-free groupby-on-host.

    Vectorized: hosts extract via a polars Rust kernel, per-DISTINCT-
    host crc32 (host cardinality is O(sources×regions), not O(rows)),
    per-URL salt via the polars xxh3 hash kernel with a fixed seed —
    Python work is O(distinct hosts) per wave."""
    import polars as pl
    arr = urls if isinstance(urls, (pa.Array, pa.ChunkedArray)) \
        else pa.array(urls, pa.string())
    s = pl.from_arrow(arr)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    # host_of-equivalent kernel: strip any scheme, stop at /?#. The
    # extract can never be null (the * matches empty), so the
    # dictionary indices below are always valid integers — a plain
    # ^https?://([^/]+) returned null for uppercase schemes /
    # scheme-less URLs (NaN fancy-index crash) and disagreed with
    # host_of on path-less URLs with a query string.
    hosts = (s.fill_null("")
             .str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
             .str.extract(r"^([^/?#]*)", 1)).to_arrow()
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    enc = hosts.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    base_u = np.empty(max(1, len(uniq)), dtype=np.int64)
    nsalt_u = np.ones(max(1, len(uniq)), dtype=np.uint64)
    for j, h in enumerate(uniq):
        h = h or ""
        base_u[j] = zlib.crc32(h.encode())
        for frag, n in cfg.skew_salts:
            if frag in h:
                nsalt_u[j] = max(1, n)
                break
    inv = enc.indices.to_numpy(zero_copy_only=False)
    salt = s.hash(seed=1147).to_numpy() % nsalt_u[inv]
    return (base_u[inv] + salt.astype(np.int64)) % cfg.host_buckets


def _write_fragment(table: pa.Table, dirpath: str,
                    row_group_size: int | None = None,
                    prefix: str = "") -> None:
    """Atomic parquet fragment write from inside a map_batches task.
    Names are unique per (worker uuid token, pid, in-process counter)
    — the token guards against pid collisions across nodes; the driver
    removes the whole generation directory before (re)running a wave, so
    retried waves replace rather than append (idempotent resume).
    ``row_group_size`` keeps frontier fragments splittable: the next
    wave's read fans out at row-group granularity (override_num_blocks),
    so wave parallelism never collapses to the writer's task count.
    ``prefix`` encodes frontier priority into the file name ("p0-" <
    "p1-" < "p2-"): read_parquet lists paths in sorted order, so
    pagination blocks stream into the fetch stage before investment and
    detail blocks — the priority queue (north_rule; SURVEY.md §2.6 O2)
    with no per-wave sort shuffle."""
    if table.num_rows == 0:
        return
    os.makedirs(dirpath, exist_ok=True)
    name = f"{prefix}{_FRAG_TOKEN}-{os.getpid()}-{next(_FRAG_COUNTER)}"
    tmp = os.path.join(dirpath, f".tmp-{name}")
    pq.write_table(table, tmp, row_group_size=row_group_size)
    os.replace(tmp, os.path.join(dirpath, f"part-{name}.parquet"))


def make_wave_fn(portal_cfg: PortalConfig, cfg: CrawlConfig,
                 politeness: PolitenessService, urlseen: UrlSeenService,
                 workdir: str, gen: int, run_token: str = ""):
    """The whole wave as ONE map_batches stage: fetch+parse the frontier
    batch, sink offer/photo fragments, push new links through the
    URL-seen shards into the next frontier, and return only the (tiny)
    per-batch summary rows the driver folds for stop decisions. One Ray
    Data execution per wave instead of five — at small wave sizes the
    crawl is otherwise dominated by execution-launch overhead."""
    fetch = make_fetch_fn(portal_cfg, cfg, politeness, run_token)
    offers_dir = os.path.join(workdir, "offers", f"gen-{gen}")
    photos_dir = os.path.join(workdir, "photos", f"gen-{gen}")
    media_dir = os.path.join(workdir, "media", f"gen-{gen}")
    next_dir = _frontier_dir(workdir, gen + 1)

    quarantine_dir = os.path.join(workdir, "quarantine", f"gen-{gen}")
    trapped_dir = os.path.join(workdir, "trapped", f"gen-{gen}")
    validators_dir = os.path.join(workdir, "validators", f"gen-{gen}")

    def wave(batch: pa.Table) -> pa.Table:
        t = fetch(batch)
        _write_fragment(_filter_kind(t, "offer").select(OFFER_OUT_COLS), offers_dir)
        photos = _filter_kind(t, "photo")
        _write_fragment(photos.select(PHOTO_OUT_COLS), photos_dir)
        if cfg.media_fetch and photos.num_rows:
            # media download in the same task that parsed the photo
            # spans: payload bytes are fetched, sniffed and hashed here
            # and never enter the object store (S11/M27, images.py:48-91)
            from ..stages.media import media_download_rows
            portal = Portal(portal_cfg)
            _write_fragment(
                media_download_rows(
                    photos.select(["offer_id", "seq", "url", "source"]),
                    portal.photo_bytes, head_mime=portal.photo_head_mime),
                media_dir)
        # validator state (cfg.validators): every detail pagemeta row
        # carrying an etag — parsed pages AND 304s (so revisit chains
        # A→B→C keep propagating validators without re-parsing).
        # Fragments are SHARDED by host bucket (filename b{bucket:04d}-
        # prefix + validators/meta.json recording the partition params):
        # a future revisit's fetch actor loads only the buckets its
        # batches touch instead of the whole url→etag map (the
        # per-actor-OOM scale hazard at 10^10 detail URLs).
        if cfg.validators or cfg.validators_from:
            pm = _filter_kind(t, "pagemeta")
            vt = (pm.filter(pc.is_valid(pm["etag"]))
                    .select(["url", "status", "etag"]))
            if vt.num_rows:
                vb = _host_buckets(vt["url"], cfg)
                vt = vt.take(pa.array(np.argsort(vb, kind="stable")))
                vbs = np.sort(vb, kind="stable")
                starts = np.flatnonzero(np.r_[True, vbs[1:] != vbs[:-1]])
                bounds = np.r_[starts, len(vbs)]
                for j in range(len(starts)):
                    off, end = int(bounds[j]), int(bounds[j + 1])
                    _write_fragment(vt.slice(off, end - off), validators_dir,
                                    prefix=f"b{int(vbs[off]):04d}-")
        # quarantine: failed fetches persisted per generation — the
        # debug-sink analogue (detail.py:241-247) and the audit trail
        # behind the fetch_fail resume path
        meta = _filter_kind(t, "pagemeta")
        _write_fragment(
            meta.filter(pc.equal(meta["status"], "fetch_fail"))
            .select(["url", "source", "region", "page_idx", "pos",
                     "fetch_kind"]),
            quarantine_dir)
        # trap-guard audit trail: links rejected by the URL-shape caps
        # (stages/fetch.py trap_like), persisted per generation like
        # quarantine — never admitted to the frontier or URL-seen set
        _write_fragment(
            _links_of(t, ["trapped"]).select(
                ["url", "source", "region", "page_idx", "pos",
                 "fetch_kind"]),
            trapped_dir)
        cand = _links_of(t, ["detail", "investment"])
        if cand.num_rows:
            mask = urlseen.filter_new(cand["url"].combine_chunks())
            cand = cand.filter(pa.array(mask))
        front = cand.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA)
        inv = pc.equal(front["kind"], "investment")
        _write_fragment(front.filter(inv), next_dir,
                        row_group_size=cfg.fetch_batch_size, prefix="p1-")
        det = front.filter(pc.invert(inv))
        # host-keyed partitioning with skew salting (north_rule): order
        # detail rows by host bucket so same-(host,salt) URLs land in
        # contiguous fragments → contiguous fetch tasks (politeness
        # locality) with no all-to-all shuffle; fixed-size fragments so
        # the next wave's read yields uniform ~batch_size blocks and no
        # fetch task becomes a multi-hundred-page straggler
        if det.num_rows:
            buckets = _host_buckets(det["url"], cfg)
            det = det.take(pa.array(np.argsort(buckets, kind="stable")))
            bsorted = np.sort(buckets, kind="stable")
            for off in range(0, det.num_rows, cfg.fetch_batch_size):
                _write_fragment(
                    det.slice(off, cfg.fetch_batch_size), next_dir,
                    row_group_size=cfg.fetch_batch_size,
                    prefix=f"p2-b{int(bsorted[off]):04d}-")
        return _summarize_batch(t, cand)

    return wave


def _summarize_batch(t: pa.Table, new_links: pa.Table) -> pa.Table:
    """Per-batch partial summary: counts + the (tiny) control rows the
    driver needs, including first-seen detail counts per listing page."""
    rows: dict[str, list] = {n: [] for n in _SUMMARY_SCHEMA.names}

    def add(tag, **kv):
        for n in _SUMMARY_SCHEMA.names:
            rows[n].append(kv.get(n))
        rows["tag"][-1] = tag

    meta = _filter_kind(t, "pagemeta")
    if meta.num_rows:
        g = meta.group_by(["source", "region", "status"]).aggregate([("url", "count")])
        for r in g.to_pylist():
            add("meta_count", source=r["source"], region=r["region"],
                status=r["status"], n=r["url_count"])
        pm = meta.filter(pc.equal(meta["fetch_kind"], "pagination"))
        for r in pm.to_pylist():
            add("pag_meta", source=r["source"], region=r["region"],
                status=r["status"], page_idx=r["page_idx"], n=r["n_links"])
    offers = _filter_kind(t, "offer")
    if offers.num_rows:
        g = offers.group_by(["source", "region"]).aggregate([("url", "count")])
        for r in g.to_pylist():
            add("offer_count", source=r["source"], region=r["region"], n=r["url_count"])
    for r in _links_of(t, ["pagination"]).to_pylist():
        add("pag_link", source=r["source"], region=r["region"], url=r["url"],
            kind=r["kind"], priority=r["priority"], page_idx=r["page_idx"], pos=r["pos"])
    for r in _links_of(t, ["investment_next"]).to_pylist():
        add("inv_next", source=r["source"], region=r["region"], url=r["url"],
            kind=r["kind"], priority=r["priority"], page_idx=r["page_idx"], pos=r["pos"])
    if new_links.num_rows:
        nd = new_links.filter(pc.and_(
            pc.equal(new_links["kind"], "detail"),
            pc.equal(new_links["fetch_kind"], "pagination")))
        if nd.num_rows:
            g = nd.group_by(["source", "region", "page_idx"]).aggregate([("url", "count")])
            for r in g.to_pylist():
                add("new_detail", source=r["source"], region=r["region"],
                    page_idx=r["page_idx"], n=r["url_count"])
    return pa.Table.from_pydict(rows, schema=_SUMMARY_SCHEMA)


def _frontier_dir(workdir: str, gen: int) -> str:
    return os.path.join(workdir, "frontier", f"gen-{gen}")


def _frontier_rows(workdir: str, gen: int) -> int:
    d = _frontier_dir(workdir, gen)
    if not os.path.isdir(d):
        return 0
    n = 0
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            n += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
    return n


def run_crawl(portal_cfg: PortalConfig, crawl_cfg: CrawlConfig, workdir: str,
              resume: bool = False, retry_rounds: int = 0,
              stop_after_generations: int | None = None) -> CrawlResult:
    """Run (or resume) the crawl. ``stop_after_generations`` simulates a
    kill after N completed waves (checkpoint committed, loop abandoned) —
    the resume-exactness tests restart from there and must produce
    byte-identical final tables.

    Resume contract: byte-identical for runs WITHOUT fetch failures.
    When failures exist, resume deliberately diverges from the crippled
    run: fetch-failed regions re-enqueue their listing chain and
    quarantined offer pages re-enqueue (reference retry semantics,
    cli.py:731-816) — recovery, not replay. Recovered offer rows keep
    their original (page_idx, pos), so a resumed-then-healed run's
    offers converge to what an unfailed run produces."""
    portal = Portal(portal_cfg)
    cfg = crawl_cfg
    urlseen = UrlSeenService(cfg.urlseen_shards, cfg.urlseen_capacity, cfg.fingerprint_bits)
    politeness = PolitenessService(cfg.politeness_shards, cfg.rps_per_host,
                                   cfg.politeness_burst,
                                   cfg.backoff_factor,
                                   cfg.backoff_cap_mult)
    run_token = uuid.uuid4().hex[:12]  # keys warm-worker stage caches per run

    state: dict[tuple[str, str], RegionState] = {
        (s, r): RegionState() for s in portal_cfg.sources for r in portal_cfg.regions
    }
    if cfg.validators_from and (os.path.realpath(cfg.validators_from)
                                == os.path.realpath(workdir)):
        # an in-place revisit would rmtree its own validator source
        # below and silently degrade to a full re-crawl
        raise ValueError("validators_from must point at a DIFFERENT "
                         "workdir than the revisit's own")
    marker = os.path.join(workdir, "revisit.json")
    if resume:
        gen = _restore_checkpoint(workdir, state, urlseen, politeness)
        if cfg.validators_from is None and os.path.exists(marker):
            # the original run was a revisit: restore validators_from so
            # the resumed run's fetch still 304s and — critically — the
            # completion carry rebuilds the gen-zcarry fragments that
            # _clean_partial drops below (a resume without the flag
            # would otherwise silently lose every 304-carried row)
            with open(marker) as f:
                cfg = replace(cfg, validators_from=json.load(f)["from"])
        _check_validator_source(cfg)
        _clean_partial(workdir, gen)
        _append_retry_rows(portal, state, _frontier_dir(workdir, gen), cfg,
                           workdir)
    else:
        _check_validator_source(cfg)
        for name in ("offers", "photos", "media", "quarantine", "trapped",
                     "validators", "frontier", "checkpoint"):
            shutil.rmtree(os.path.join(workdir, name), ignore_errors=True)
        os.makedirs(workdir, exist_ok=True)
        if cfg.validators_from:
            with open(marker, "w") as f:
                json.dump({"from": cfg.validators_from}, f)
        elif os.path.exists(marker):
            os.unlink(marker)
        if cfg.validators or cfg.validators_from:
            # layout marker + the partition params a future revisit
            # needs to recompute each URL's validator shard (survives
            # _clean_partial: that only removes gen-* dirs)
            vroot = os.path.join(workdir, "validators")
            os.makedirs(vroot, exist_ok=True)
            with open(os.path.join(vroot, "meta.json"), "w") as f:
                json.dump({"host_buckets": cfg.host_buckets,
                           "skew_salts": [list(p) for p in cfg.skew_salts]},
                          f)
        gen = 0
        d = _frontier_dir(workdir, 0)
        os.makedirs(d)
        # small row groups: read_parquet can only split at row-group
        # granularity, and the seed wave must fan out across workers
        # (one row group would pin generation 0 to a single task)
        pq.write_table(_seed_table(portal, cfg),
                       os.path.join(d, "part-p0-seeds.parquet"),
                       row_group_size=8)

    retries_left = retry_rounds
    last_ckpt = -1
    ckpt_idx = 0
    while True:
        if _frontier_rows(workdir, gen) == 0:
            if retries_left > 0:
                os.makedirs(_frontier_dir(workdir, gen), exist_ok=True)
                _append_retry_rows(portal, state, _frontier_dir(workdir, gen),
                                   cfg, workdir)
                if _frontier_rows(workdir, gen) == 0:
                    break
                retries_left -= 1
            else:
                break
        try:
            _run_wave(portal, cfg, workdir, gen, urlseen, politeness, state,
                      run_token)
        except Exception as e:
            raise RuntimeError(
                f"wave {gen} failed mid-execution (worker death or task "
                "error); URL-seen admissions may be partial — re-run with "
                "resume=True to replay from the last checkpoint "
                "(replace-on-retry is idempotent)") from e
        # checkpoint interval: skipped waves re-run deterministically on
        # resume (replace-on-retry), trading a little recompute for less
        # per-wave filter-dump I/O
        if (gen + 1) % cfg.checkpoint_every == 0:
            _write_checkpoint(workdir, gen, state, urlseen, politeness,
                              full=ckpt_idx % cfg.checkpoint_full_every == 0)
            ckpt_idx += 1
            last_ckpt = gen
        gen += 1
        if stop_after_generations is not None and gen >= stop_after_generations:
            break  # simulated kill: checkpoint durable, work abandoned
    if gen > 0 and last_ckpt != gen - 1 and stop_after_generations is None:
        _write_checkpoint(workdir, gen - 1, state, urlseen, politeness)  # durable terminal state

    if cfg.validators_from and stop_after_generations is None:
        _carry_not_modified(workdir, cfg.validators_from)
    res = CrawlResult(workdir=workdir, generations=gen,
                      state={f"{s}|{r}": asdict(st) for (s, r), st in state.items()},
                      limit_offers=cfg.limit_offers,
                      source_order=tuple(portal_cfg.sources),
                      region_order=tuple(portal_cfg.regions))
    for st in state.values():
        res.pages_fetched += st.fetched
        res.pages_failed += st.failed
        res.offers += st.parsed
    return res


def _check_validator_source(cfg: CrawlConfig) -> None:
    """A revisit whose validator source vanished (prior workdir moved or
    deleted) must fail loudly: an empty validator map would silently
    degrade the run to a full re-crawl with an EMPTY 304 carry — i.e.
    silent data loss in the output tables, not just wasted fetches."""
    if cfg.validators_from and not os.path.isdir(
            os.path.join(cfg.validators_from, "validators")):
        raise ValueError(
            f"validators_from={cfg.validators_from!r} has no validators/ "
            "directory — the prior run's workdir is gone or was never a "
            "validators=True run; refusing to silently degrade to a full "
            "re-crawl with an empty carry")


def _carry_not_modified(workdir: str, prior_workdir: str) -> None:
    """Revisit completion: detail pages answered 304 produced no offer /
    photo rows this run — their rows are BY DEFINITION the prior run's
    (the validator matched, so the content is unchanged). Copy them
    forward as one extra fragment generation so the revisit's output
    tables equal a full re-crawl's byte-for-byte. O(not-modified rows):
    only the carried subset is read and rewritten, never re-fetched or
    re-parsed."""
    # replace-on-rerun: a completed revisit that runs again must not
    # append a second carry generation
    for name in ("offers", "photos", "media"):
        shutil.rmtree(os.path.join(workdir, name, "gen-zcarry"),
                      ignore_errors=True)
    vres = CrawlResult(workdir=workdir, generations=0)
    v = vres._read_gen_dirs("validators")
    if v is None:
        return
    nm = v.filter(pc.equal(v["status"], "not_modified"))
    if nm.num_rows == 0:
        return
    urls = nm["url"].combine_chunks()
    prior = CrawlResult(workdir=prior_workdir, generations=0)
    po = prior._read_gen_dirs("offers")
    if po is not None:
        carried = po.filter(pc.is_in(po["url"], value_set=urls))
        _write_fragment(carried,
                        os.path.join(workdir, "offers", "gen-zcarry"))
        if carried.num_rows:
            kept = carried["offer_id"].combine_chunks()
            for name in ("photos", "media"):  # media: downloaded payloads
                pt = prior._read_gen_dirs(name)
                if pt is not None:
                    _write_fragment(
                        pt.filter(pc.is_in(pt["offer_id"], value_set=kept)),
                        os.path.join(workdir, name, "gen-zcarry"))


def _seed_table(portal: Portal, cfg: CrawlConfig) -> pa.Table:
    return pa.Table.from_pylist(
        [{"url": s["url"], "kind": "pagination", "priority": 0, "source": s["source"],
          "region": s["region"], "page_idx": 1, "pos": 0}
         for s in portal.seeds(cfg.last_days)],
        schema=FRONTIER_SCHEMA)


def _append_retry_rows(portal: Portal, state: dict, fdir: str,
                       cfg: CrawlConfig, workdir: str | None = None) -> None:
    """Retry enqueue (reference retry rounds, cli.py:731-816):

    - fetch-failed regions resume their LISTING chain at
      last_page_done+1 (cli.py:756-762);
    - quarantined DETAIL/INVESTMENT pages re-enqueue unless an offers
      row proves the detail page has since been fetched (the reference
      re-fetches failed offer URLs; without this they were admitted to
      the URL-seen set at discovery and lost forever). Retried detail
      rows carry kind='detail-retry' so the urls table (derived from
      kind='detail' frontier rows — each discovery exactly once) is
      not polluted; they fetch exactly like details and keep their
      original (page_idx, pos), so recovered offer rows are
      byte-identical to an unfailed run's. Investment retries have no
      success marker and simply re-fetch — idempotent, since their
      re-emitted links dedup against the URL-seen set. Fixed fragment
      names make repeated resume calls overwrite, not stack."""
    rows = []
    for (s, r), st in state.items():
        if st.stop_reason == "fetch_fail":
            p = st.last_page_done + 1
            rows.append({"url": portal.listing_url(s, r, p, cfg.last_days),
                         "kind": "pagination",
                         "priority": 0, "source": s, "region": r, "page_idx": p, "pos": 0})
            st.stop_reason = ""
    if rows:
        os.makedirs(fdir, exist_ok=True)
        pq.write_table(pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA),
                       os.path.join(fdir, "part-p0-retry.parquet"),
                       row_group_size=8)
    if workdir is None:
        return
    q = _pending_quarantined_offer_pages(workdir)
    if q is None or q.num_rows == 0:
        return
    os.makedirs(fdir, exist_ok=True)
    for fk, kind, prio, name in (("investment", "investment", 1,
                                  "part-p1-retryinv.parquet"),
                                 ("detail", "detail-retry", 2,
                                  "part-p2-retrydet.parquet")):
        sel = q.filter(pc.equal(q["fetch_kind"], fk))
        if not sel.num_rows:
            continue
        t = pa.table({
            "url": sel["url"],
            "kind": pa.array([kind] * sel.num_rows, pa.string()),
            "priority": pa.array(np.full(sel.num_rows, prio, np.int32)),
            "source": sel["source"], "region": sel["region"],
            "page_idx": sel["page_idx"], "pos": sel["pos"],
        }).cast(FRONTIER_SCHEMA)
        pq.write_table(t, os.path.join(fdir, name),
                       row_group_size=cfg.fetch_batch_size)


def _pending_quarantined_offer_pages(workdir: str) -> pa.Table | None:
    """Distinct quarantined detail/investment pages with no offers row
    for their URL. The offers check is a streamed, column-pruned
    ``pc.is_in`` probe — the driver only ever holds the quarantine-
    sized URL set (operationally small: it is the set of FAILED
    fetches), never the offers table."""
    qdir = os.path.join(workdir, "quarantine")
    if not os.path.isdir(qdir):
        return None
    qfiles = []
    for d in sorted(os.listdir(qdir)):
        gd = os.path.join(qdir, d)
        if d.startswith("gen-") and os.path.isdir(gd):
            qfiles += [os.path.join(gd, f) for f in sorted(os.listdir(gd))
                       if f.endswith(".parquet")]
    if not qfiles:
        return None
    parts = []
    for f in qfiles:
        t = pq.read_table(f)
        if "pos" not in t.column_names:  # pre-pos quarantine fragments
            t = t.append_column("pos", pa.array(
                np.zeros(t.num_rows, np.int32)))
        parts.append(t.select(["url", "source", "region", "page_idx",
                               "pos", "fetch_kind"]))
    q = pa.concat_tables(parts)
    q = q.filter(pc.is_in(q["fetch_kind"],
                          value_set=pa.array(["detail", "investment"])))
    if not q.num_rows:
        return q
    # distinct by url, keep first occurrence
    df = q.to_pandas().drop_duplicates(subset=["url"], keep="first")
    q = pa.Table.from_pandas(df, preserve_index=False)
    det_urls = q.filter(pc.equal(q["fetch_kind"], "detail"))["url"]
    odir = os.path.join(workdir, "offers")
    ofiles = []
    if os.path.isdir(odir):
        for d in sorted(os.listdir(odir)):
            gd = os.path.join(odir, d)
            if d.startswith("gen-") and os.path.isdir(gd):
                ofiles += [os.path.join(gd, f) for f in sorted(os.listdir(gd))
                           if f.endswith(".parquet")]
    if not ofiles or not len(det_urls):
        return q
    ref = ray.put(det_urls.combine_chunks())

    def probe(t: pa.Table) -> pa.Table:
        return (t.filter(pc.is_in(t["url"], value_set=ray.get(ref)))
                .select(["url"]))

    done = rd.read_parquet(ofiles, columns=["url"]).map_batches(
        probe, batch_format="pyarrow").take_all()
    fetched = {r["url"] for r in done}
    if not fetched:
        return q
    mask = [u not in fetched for u in q["url"].to_pylist()]
    return q.filter(pa.array(mask))


def _run_wave(portal: Portal, cfg: CrawlConfig, workdir: str, gen: int,
              urlseen: UrlSeenService, politeness: PolitenessService,
              state: dict, run_token: str = "") -> None:
    # replace-on-retry: this wave's outputs are recreated from scratch
    next_dir = _frontier_dir(workdir, gen + 1)
    for d in (os.path.join(workdir, "offers", f"gen-{gen}"),
              os.path.join(workdir, "photos", f"gen-{gen}"),
              os.path.join(workdir, "media", f"gen-{gen}"),
              os.path.join(workdir, "quarantine", f"gen-{gen}"), next_dir):
        shutil.rmtree(d, ignore_errors=True)

    # frontier windowing: split the generation's fragment files into
    # bounded sub-windows (file-granular; priority order preserved by
    # the sorted "part-p{prio}-…" names) so one execution never has to
    # hold an arbitrarily large frontier. Summaries fold across windows.
    fdir = _frontier_dir(workdir, gen)
    files = sorted(f for f in os.listdir(fdir) if f.endswith(".parquet"))
    # one footer read per fragment: the split loop records each
    # window's row total so run_window never re-opens the footers
    windows: list[tuple[list[str], int]] = [([], 0)]
    for f in files:
        paths, rows = windows[-1]
        paths.append(os.path.join(fdir, f))
        rows += pq.ParquetFile(os.path.join(fdir, f)).metadata.num_rows
        windows[-1] = (paths, rows)
        if cfg.max_wave_rows is not None and rows >= cfg.max_wave_rows:
            windows.append(([], 0))
    wave_fn = make_wave_fn(portal.cfg, cfg, politeness, urlseen, workdir, gen,
                           run_token)

    def run_window(win: tuple[list[str], int]) -> list[dict]:
        paths, n_rows = win
        # fan out to ~one block per fetch batch (row-group-granular
        # splits) so parallelism tracks window size, not the previous
        # wave's writer-task count; sorted paths keep the priority
        # queue: pagination (p0) blocks stream into the fetch stage
        # before investment (p1) before detail (p2) — no sort shuffle
        # (north_rule; SURVEY.md §2.6 O2)
        nblocks = max(1, -(-n_rows // cfg.fetch_batch_size))
        # small waves (seed wave, deep-pagination tail): one batch-sized
        # block would idle most of the cluster for a whole frontier
        # round-trip; spread down to 8-row blocks until every CPU has
        # work (row-group granularity permitting)
        ncpu = int(ray.cluster_resources().get("CPU", 1))
        if nblocks < ncpu:
            nblocks = min(ncpu, max(1, -(-n_rows // 8)))
        # datasource creation is serialized: ray's path resolution
        # probes `fsspec.implementations.http`, whose (always-failing,
        # aiohttp-less) import races under concurrent windows into a
        # bare ImportError that ray does not catch; the lock covers
        # only the cheap metadata step, execution stays concurrent
        with _READ_LOCK:
            ds = rd.read_parquet(paths, override_num_blocks=nblocks)
        # max_retries=0: wave tasks perform NON-IDEMPOTENT side effects
        # (fragment writes + URL-seen test-and-set), and Ray's default
        # transparently re-runs a task whose worker died — a silently
        # retried wave task would duplicate offer fragments AND
        # permanently drop the URLs the dead attempt had already
        # admitted (the retry sees them as 'seen'). Failing the wave
        # loudly instead is recoverable: resume=True replays from the
        # last checkpoint, whose replace-on-retry semantics ARE
        # idempotent (tested byte-identical).
        return ds.map_batches(
            wave_fn, batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
            concurrency=cfg.fetch_concurrency,
            num_cpus=cfg.fetch_num_cpus,
            max_retries=0).take_all()

    windows = [w for w in windows if w[0]]
    summary: list[dict] = []
    if len(windows) <= 1:
        if windows:
            summary = run_window(windows[0])
    else:
        # double-buffered windows: at most TWO window executions in
        # flight, so the in-flight frontier stays bounded at
        # ~2·max_wave_rows while the inter-window barrier (one window's
        # straggler tail) hides behind the next window's ramp-up.
        # Summaries are folded in window order (ex.map preserves it) —
        # the fold is order-independent anyway (counts are commutative,
        # pag_link/pag_meta keys are unique per wave).
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as ex:
            for part in ex.map(run_window, windows):
                summary.extend(part)

    newc: dict[tuple[str, str, int], int] = {}
    pag_meta, pag_links, inv_next = [], {}, []
    for r in summary:
        st: RegionState = state[(r["source"], r["region"])]
        if r["tag"] == "new_detail":
            k = (r["source"], r["region"], int(r["page_idx"]))
            newc[k] = newc.get(k, 0) + int(r["n"])
        elif r["tag"] == "meta_count":
            if r["status"] == "fetch_fail":
                st.failed += int(r["n"])
            else:
                st.fetched += int(r["n"])
        elif r["tag"] == "offer_count":
            st.parsed += int(r["n"])
        elif r["tag"] == "pag_meta":
            pag_meta.append(r)
        elif r["tag"] == "pag_link":
            pag_links[(r["source"], r["region"])] = r
        elif r["tag"] == "inv_next":
            inv_next.append(r)

    # ---- per-region stop decisions (auto-stop watermarks, §2.9) ------------
    next_rows: list[dict] = [
        {c: r[c] for c in FRONTIER_COLS} for r in inv_next]
    for m in pag_meta:
        key = (m["source"], m["region"])
        st = state[key]
        p = int(m["page_idx"])
        if m["status"] == "fetch_fail":
            st.stop_reason = "fetch_fail"
            continue
        st.last_page_done = p
        if m["status"] == "empty":
            st.stop_reason = "no_links"
            continue
        if newc.get((m["source"], m["region"], p), 0) == 0:
            st.no_new_streak += 1
        else:
            st.no_new_streak = 0
        # per-source no-new stop policy (config.NO_NEW_STOP registry,
        # overridable per run via PortalConfig.extra_sources — §2.10)
        limit = portal.cfg.source_no_new_stop(m["source"])
        if limit is not None and st.no_new_streak >= limit:
            st.stop_reason = "no_new"
            continue
        nxt = pag_links.get(key)
        if nxt is None:
            st.stop_reason = "no_links"
            continue
        if cfg.max_pages is not None and p + 1 > cfg.max_pages:
            st.stop_reason = "max_pages"
            continue
        next_rows.append({c: nxt[c] for c in FRONTIER_COLS})

    if next_rows:
        os.makedirs(next_dir, exist_ok=True)
        # row_group_size=8: read_parquet splits only at row-group
        # granularity, so one big group would serialize every region's
        # pagination fetch into a single task each wave (the same
        # reason the gen-0 seed file uses row groups of 8)
        pq.write_table(pa.Table.from_pylist(next_rows, schema=FRONTIER_SCHEMA),
                       os.path.join(next_dir, "part-p0-driver.parquet"),
                       row_group_size=8)


# ---------------------------------------------------------------------------
# checkpoint / resume (FIXTURES.md F6; reference cli.py:98-152, 706-816)
# ---------------------------------------------------------------------------


def _write_checkpoint(workdir: str, gen: int, state: dict,
                      urlseen: UrlSeenService,
                      politeness: "PolitenessService | None" = None,
                      full: bool = True) -> None:
    """Atomic checkpoint commit. ``full`` dumps complete filter bytes;
    otherwise only the keys admitted since the previous checkpoint
    (incremental — at 10^10 keys full dumps are ~20 GB, deltas are
    proportional to the wave's new URLs). Region state is always full
    (tiny). Retention keeps everything back to the second-newest full
    checkpoint so a delta chain is always restorable."""
    root = os.path.join(workdir, "checkpoint")
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".tmp-gen-{gen}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "state.json"), "w") as f:
        json.dump({"generation": gen,
                   "regions": {f"{s}|{r}": asdict(st) for (s, r), st in state.items()}},
                  f)
    # per-host politeness budgets (north_star crawl-state clause):
    # remaining per-host delays, relative so a restarted process's
    # monotonic clock doesn't matter
    if politeness is not None:
        with open(os.path.join(tmp, "politeness.json"), "w") as f:
            json.dump(politeness.dump_headroom(), f)
    sub = "filters" if full else "deltas"
    blobs = urlseen.dump() if full else urlseen.dump_deltas()
    os.makedirs(os.path.join(tmp, sub))
    for i, blob in enumerate(blobs):
        with open(os.path.join(tmp, sub, f"shard_{i}.bin"), "wb") as f:
            f.write(blob)
    final = os.path.join(root, f"gen-{gen}")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)  # atomic commit: wave `gen` is durably done
    gens = sorted(int(d.split("-", 1)[1]) for d in os.listdir(root)
                  if d.startswith("gen-"))
    fulls = [g for g in gens
             if os.path.isdir(os.path.join(root, f"gen-{g}", "filters"))]
    if len(fulls) >= 2:
        for g in gens:
            if g < fulls[-2]:
                shutil.rmtree(os.path.join(root, f"gen-{g}"), ignore_errors=True)


def latest_checkpoint_gen(workdir: str) -> int | None:
    root = os.path.join(workdir, "checkpoint")
    if not os.path.isdir(root):
        return None
    gens = [int(d.split("-", 1)[1]) for d in os.listdir(root) if d.startswith("gen-")]
    return max(gens) if gens else None


def _read_shard_blobs(d: str) -> list[bytes]:
    blobs = []
    for i in range(len(os.listdir(d))):
        with open(os.path.join(d, f"shard_{i}.bin"), "rb") as f:
            blobs.append(f.read())
    return blobs


def _restore_checkpoint(workdir: str, state: dict, urlseen: UrlSeenService,
                        politeness: "PolitenessService | None" = None) -> int:
    last = latest_checkpoint_gen(workdir)
    if last is None:
        raise FileNotFoundError(f"no checkpoint under {workdir}")
    root = os.path.join(workdir, "checkpoint")
    with open(os.path.join(root, f"gen-{last}", "state.json")) as f:
        payload = json.load(f)
    for key, st in payload["regions"].items():
        s, r = key.split("|")
        state[(s, r)] = RegionState(**st)
    pol_path = os.path.join(root, f"gen-{last}", "politeness.json")
    if politeness is not None and os.path.exists(pol_path):
        with open(pol_path) as f:
            politeness.restore_headroom(json.load(f))
    # filter state: newest full dump ≤ last, then replay delta chain
    gens = sorted(int(d.split("-", 1)[1]) for d in os.listdir(root)
                  if d.startswith("gen-") and int(d.split("-", 1)[1]) <= last)
    fulls = [g for g in gens
             if os.path.isdir(os.path.join(root, f"gen-{g}", "filters"))]
    if not fulls:
        raise FileNotFoundError(f"no full filter checkpoint under {root}")
    base = fulls[-1]
    urlseen.restore(_read_shard_blobs(os.path.join(root, f"gen-{base}", "filters")))
    for g in gens:
        if g > base and os.path.isdir(os.path.join(root, f"gen-{g}", "deltas")):
            urlseen.apply_deltas(
                _read_shard_blobs(os.path.join(root, f"gen-{g}", "deltas")))
    return last + 1


def _clean_partial(workdir: str, resume_gen: int) -> None:
    """Idempotent resume: wave `resume_gen` re-runs from scratch, so its
    (possibly partial) outputs and any partially-written next frontier
    are dropped and re-written deterministically (replace-on-retry)."""
    for name, cutoff in (("offers", resume_gen), ("photos", resume_gen),
                         ("media", resume_gen), ("quarantine", resume_gen),
                         ("trapped", resume_gen), ("validators", resume_gen),
                         ("frontier", resume_gen + 1)):
        root = os.path.join(workdir, name)
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            if not d.startswith("gen-"):
                continue
            suffix = d.split("-", 1)[1]
            # non-numeric generations (the revisit's carry fragments)
            # are completion artifacts: always rebuilt at the end of a
            # resumed run, so a resume drops them unconditionally
            if not suffix.isdigit() or int(suffix) >= cutoff:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
