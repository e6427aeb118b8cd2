"""The crawl pipeline: frontier generation loop over Ray Data.

Architecture (SURVEY.md §7.1): per generation ("wave"),

    frontier/gen=G (parquet) ──read_parquet──▶ sort(priority)   (pagination first)
      ─▶ map_batches(fetch+parse, per-worker cached state)      (politeness, robots, retries)
      ─▶ materialize (bounded: one wave of *parsed* records — HTML never
         enters the object store; fetch and parse share a stage)
      ─▶ offers  → workdir/offers/gen=G    (deterministic per-gen dirs → idempotent)
      ─▶ photos  → workdir/photos/gen=G
      ─▶ links   → cuckoo URL-seen shards (test-and-set) → first-seen rows
                   → frontier/gen=G+1 (the next wave, written distributed)
      ─▶ one summary pass (partial aggregates per batch → tiny take_all)
         → per-region stop logic on the driver (auto-stop watermarks,
           SURVEY.md §2.9) → next pagination rows appended to frontier/gen=G+1
      ─▶ checkpoint gen=G: region state + filter shard bytes (atomic dir
         rename); resume re-enters at the first incomplete wave and
         re-writes its outputs deterministically (replace-on-retry).

The driver holds only O(#regions) state: everything row-shaped flows
through Datasets or per-generation parquet. Per-wave ``materialize()``
is bounded by the wave's page count; at 10^10-URL scale a frontier
window (split frontier/gen=G into fixed-size sub-waves) caps it — the
loop structure is unchanged.

The golden ``urls`` table (reference urls.csv, otodom.py:620-625) is
derived from the frontier parquet (kind='detail' rows), not written
separately — the frontier IS the discovery log.

Reference lifecycle analogue: /root/reference/scrapper/cli.py:731-816
(live-all with resume/retry rounds) + pipelines/stream.py:140-157.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Sum

from ..config import CrawlConfig, PortalConfig
from ..functions.urls import extract_offer_ids
from ..sources.synth_portal import Portal
from ..stages.fetch import make_fetch_fn
from ..state.politeness import PolitenessService
from ..state.urlseen import UrlSeenService

FRONTIER_COLS = ["url", "kind", "priority", "source", "region", "page_idx", "pos"]
FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()), ("kind", pa.string()), ("priority", pa.int32()),
    ("source", pa.string()), ("region", pa.string()),
    ("page_idx", pa.int32()), ("pos", pa.int32())])
OFFER_OUT_COLS = ["offer_id", "source", "url", "price_amount", "price_currency",
                  "price_per_m2", "city", "lat", "lon", "area_m2", "rooms",
                  "region", "page_idx", "pos"]
PHOTO_OUT_COLS = ["offer_id", "seq", "url"]

_SUMMARY_SCHEMA = pa.schema([
    ("tag", pa.string()),        # meta_count | offer_count | pag_meta | pag_link | inv_next
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

    def _read_gen_dirs(self, name: str) -> pa.Table | None:
        root = os.path.join(self.workdir, name)
        parts = []
        if os.path.isdir(root):
            for gen in sorted(os.listdir(root)):
                d = os.path.join(root, gen)
                for f in sorted(os.listdir(d)):
                    if f.endswith(".parquet"):
                        parts.append(pq.read_table(os.path.join(d, f)))
        return pa.concat_tables(parts, promote_options="default") if parts else None

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
        return t if t is not None else pa.table({})


def _filter_kind(t: pa.Table, kind: str) -> pa.Table:
    return t.filter(pc.equal(t["rec_kind"], kind))


def _links_of(t: pa.Table, kinds: list[str]) -> pa.Table:
    links = _filter_kind(t, "link")
    return links.filter(pc.is_in(links["kind"], value_set=pa.array(kinds)))


def make_dedup_fn(urlseen: UrlSeenService):
    """Stateless map_batches fn: routes candidate frontier rows through
    the URL-seen shard actors (test-and-set) and keeps first-seen rows."""

    def dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        new = urlseen.filter_new(t["url"].combine_chunks())
        return t.filter(pa.array(new))

    return dedup


def _summarize_batch(t: pa.Table) -> pa.Table:
    """Per-batch partial summary: counts + the (tiny) control rows the
    driver needs. One execution replaces five small ones per wave."""
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
    byte-identical final tables."""
    portal = Portal(portal_cfg)
    cfg = crawl_cfg
    urlseen = UrlSeenService(cfg.urlseen_shards, cfg.urlseen_capacity, cfg.fingerprint_bits)
    politeness = PolitenessService(cfg.politeness_shards, cfg.rps_per_host)

    state: dict[tuple[str, str], RegionState] = {
        (s, r): RegionState() for s in portal_cfg.sources for r in portal_cfg.regions
    }
    if resume:
        gen = _restore_checkpoint(workdir, state, urlseen)
        _clean_partial(workdir, gen)
        _append_retry_rows(portal, state, _frontier_dir(workdir, gen))
    else:
        for name in ("offers", "photos", "frontier", "checkpoint"):
            shutil.rmtree(os.path.join(workdir, name), ignore_errors=True)
        os.makedirs(workdir, exist_ok=True)
        gen = 0
        d = _frontier_dir(workdir, 0)
        os.makedirs(d)
        pq.write_table(_seed_table(portal), os.path.join(d, "seeds.parquet"))

    retries_left = retry_rounds
    while True:
        if _frontier_rows(workdir, gen) == 0:
            failed = [k for k, st in state.items() if st.stop_reason == "fetch_fail"]
            if failed and retries_left > 0:
                retries_left -= 1
                os.makedirs(_frontier_dir(workdir, gen), exist_ok=True)
                _append_retry_rows(portal, state, _frontier_dir(workdir, gen))
                if _frontier_rows(workdir, gen) == 0:
                    break
            else:
                break
        _run_wave(portal, cfg, workdir, gen, urlseen, politeness, state)
        _write_checkpoint(workdir, gen, state, urlseen)
        gen += 1
        if stop_after_generations is not None and gen >= stop_after_generations:
            break  # simulated kill: checkpoint durable, work abandoned

    res = CrawlResult(workdir=workdir, generations=gen,
                      state={f"{s}|{r}": asdict(st) for (s, r), st in state.items()})
    for st in state.values():
        res.pages_fetched += st.fetched
        res.pages_failed += st.failed
        res.offers += st.parsed
    return res


def _seed_table(portal: Portal) -> pa.Table:
    return pa.Table.from_pylist(
        [{"url": s["url"], "kind": "pagination", "priority": 0, "source": s["source"],
          "region": s["region"], "page_idx": 1, "pos": 0} for s in portal.seeds()],
        schema=FRONTIER_SCHEMA)


def _append_retry_rows(portal: Portal, state: dict, fdir: str) -> None:
    """fetch-failed regions resume at last_page_done+1 (cli.py:756-762)."""
    rows = []
    for (s, r), st in state.items():
        if st.stop_reason == "fetch_fail":
            p = st.last_page_done + 1
            rows.append({"url": portal.listing_url(s, r, p), "kind": "pagination",
                         "priority": 0, "source": s, "region": r, "page_idx": p, "pos": 0})
            st.stop_reason = ""
    if rows:
        os.makedirs(fdir, exist_ok=True)
        pq.write_table(pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA),
                       os.path.join(fdir, "retry.parquet"))


def _run_wave(portal: Portal, cfg: CrawlConfig, workdir: str, gen: int,
              urlseen: UrlSeenService, politeness: PolitenessService,
              state: dict) -> None:
    ds = rd.read_parquet(_frontier_dir(workdir, gen))
    # explicit priority queue: pagination (0) before investment (1) before
    # detail (2) within the wave (north_rule; SURVEY.md §2.6 O2)
    ds = ds.sort("priority")
    mat = ds.map_batches(make_fetch_fn(portal.cfg, cfg, politeness),
                         batch_format="pyarrow",
                         batch_size=cfg.fetch_batch_size).materialize()

    # ---- sinks -------------------------------------------------------------
    mat.map_batches(lambda t: _filter_kind(t, "offer").select(OFFER_OUT_COLS),
                    batch_format="pyarrow").write_parquet(
        os.path.join(workdir, "offers", f"gen-{gen}"))
    mat.map_batches(lambda t: _filter_kind(t, "photo").select(PHOTO_OUT_COLS),
                    batch_format="pyarrow").write_parquet(
        os.path.join(workdir, "photos", f"gen-{gen}"))

    # ---- frontier expansion: first-seen links through cuckoo shards --------
    new_links = (mat.map_batches(
        lambda t: _links_of(t, ["detail", "investment"])
        .select(FRONTIER_COLS + ["fetch_kind"]), batch_format="pyarrow")
        .map_batches(make_dedup_fn(urlseen), batch_format="pyarrow",
                     batch_size=4096)
        .materialize())
    next_dir = _frontier_dir(workdir, gen + 1)
    shutil.rmtree(next_dir, ignore_errors=True)
    new_links.map_batches(lambda t: t.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA),
                          batch_format="pyarrow").write_parquet(next_dir)

    # per-(region, page) new-detail counts from *listing* pages → stop
    # logic. Partial aggregation per batch, tiny global groupby after —
    # the pre-aggregate pattern that keeps the shuffle small at scale.
    newc: dict[tuple[str, str, int], int] = {}
    counts = (new_links.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["kind"], "detail"),
                                   pc.equal(t["fetch_kind"], "pagination")))
        .group_by(["source", "region", "page_idx"]).aggregate([("url", "count")]),
        batch_format="pyarrow")
        .groupby(["source", "region", "page_idx"])
        .aggregate(Sum("url_count", alias_name="n")).take_all())
    for row in counts:
        newc[(row["source"], row["region"], row["page_idx"])] = int(row["n"])

    # ---- one summary pass: metrics + control rows --------------------------
    summary = mat.map_batches(_summarize_batch, batch_format="pyarrow").take_all()
    pag_meta, pag_links, inv_next = [], {}, []
    for r in summary:
        st: RegionState = state[(r["source"], r["region"])]
        if r["tag"] == "meta_count":
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
        # two consecutive zero-new pages stop morizon/gratka
        # (morizon.py:697-709); one stops trojmiasto
        # (trojmiasto.py:262-265); otodom only stops on empty pages /
        # max_pages (otodom.py:507-510)
        src = m["source"]
        limit = 1 if src == "trojmiasto" else 2
        if src != "otodom" and st.no_new_streak >= limit:
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
        pq.write_table(pa.Table.from_pylist(next_rows, schema=FRONTIER_SCHEMA),
                       os.path.join(next_dir, "driver.parquet"))


# ---------------------------------------------------------------------------
# checkpoint / resume (FIXTURES.md F6; reference cli.py:98-152, 706-816)
# ---------------------------------------------------------------------------


def _write_checkpoint(workdir: str, gen: int, state: dict,
                      urlseen: UrlSeenService) -> None:
    root = os.path.join(workdir, "checkpoint")
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".tmp-gen-{gen}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "state.json"), "w") as f:
        json.dump({"generation": gen,
                   "regions": {f"{s}|{r}": asdict(st) for (s, r), st in state.items()}},
                  f)
    os.makedirs(os.path.join(tmp, "filters"))
    for i, blob in enumerate(urlseen.dump()):
        with open(os.path.join(tmp, "filters", f"shard_{i}.bin"), "wb") as f:
            f.write(blob)
    final = os.path.join(root, f"gen-{gen}")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)  # atomic commit: wave `gen` is durably done
    shutil.rmtree(os.path.join(root, f"gen-{gen - 2}"), ignore_errors=True)


def latest_checkpoint_gen(workdir: str) -> int | None:
    root = os.path.join(workdir, "checkpoint")
    if not os.path.isdir(root):
        return None
    gens = [int(d.split("-", 1)[1]) for d in os.listdir(root) if d.startswith("gen-")]
    return max(gens) if gens else None


def _restore_checkpoint(workdir: str, state: dict, urlseen: UrlSeenService) -> int:
    last = latest_checkpoint_gen(workdir)
    if last is None:
        raise FileNotFoundError(f"no checkpoint under {workdir}")
    d = os.path.join(workdir, "checkpoint", f"gen-{last}")
    with open(os.path.join(d, "state.json")) as f:
        payload = json.load(f)
    for key, st in payload["regions"].items():
        s, r = key.split("|")
        state[(s, r)] = RegionState(**st)
    fdir = os.path.join(d, "filters")
    blobs = []
    for i in range(len(os.listdir(fdir))):
        with open(os.path.join(fdir, f"shard_{i}.bin"), "rb") as f:
            blobs.append(f.read())
    urlseen.restore(blobs)
    return last + 1


def _clean_partial(workdir: str, resume_gen: int) -> None:
    """Idempotent resume: wave `resume_gen` re-runs from scratch, so its
    (possibly partial) outputs and any partially-written next frontier
    are dropped and re-written deterministically (replace-on-retry)."""
    for name, cutoff in (("offers", resume_gen), ("photos", resume_gen),
                         ("frontier", resume_gen + 1)):
        root = os.path.join(workdir, name)
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            if d.startswith("gen-") and int(d.split("-", 1)[1]) >= cutoff:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
