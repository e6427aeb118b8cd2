"""Reference-format CSV round trip: exact headers/column order, empty-
string fill, and the tolerant offer_url/url/href frontier reader."""

import csv
import os

import pytest

from realestate_scraper_ray.config import OFFER_COLUMNS, CrawlConfig, PortalConfig
from realestate_scraper_ray.pipelines.crawl import run_crawl
from realestate_scraper_ray.pipelines.io_compat import (
    PHOTO_COLUMNS, URLS_COLUMNS, export_reference_csv, read_urls_csv,
)


@pytest.fixture(scope="module")
def exported(tmp_path_factory, ray_session):
    wd = tmp_path_factory.mktemp("csvcrawl")
    pcfg = PortalConfig(regions=("pomorskie",), base_pages=2,
                        page_size_scale=0.12)
    res = run_crawl(pcfg, CrawlConfig(urlseen_shards=2,
                                      urlseen_capacity=1 << 14,
                                      fetch_batch_size=64), str(wd / "run"))
    out = str(wd / "csv")
    counts = export_reference_csv(res, out)
    return res, out, counts


def test_reference_headers_and_counts(exported):
    res, out, counts = exported
    for fname, header, table in (("urls.csv", URLS_COLUMNS, "urls"),
                                 ("offers.csv", OFFER_COLUMNS, "offers"),
                                 ("photos.csv", PHOTO_COLUMNS, "photos")):
        with open(os.path.join(out, fname), newline="") as f:
            rows = list(csv.reader(f))
        assert tuple(rows[0]) == tuple(header)       # exact column order
        assert len(rows) - 1 == counts[fname] == res.table(table).num_rows
    # every cell is a string; engine nulls became '' (storage.py:75)
    with open(os.path.join(out, "offers.csv"), newline="") as f:
        body = list(csv.DictReader(f))
    assert all(v is not None for r in body for v in r.values())
    # offer values survive the round trip
    eng = res.table("offers").to_pandas().sort_values("offer_id")
    assert sorted(r["offer_id"] for r in body) == list(eng["offer_id"])


@pytest.mark.parametrize("colname", ["offer_url", "url", "href"])
def test_read_urls_csv_tolerant_columns(tmp_path, ray_session, colname):
    p = str(tmp_path / "u.csv")
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([colname, "extra"])
        w.writerow(["https://a.example.pl/x", "1"])
        w.writerow(["", "2"])                        # blank cell skipped
        w.writerow(["https://b.example.pl/y", "3"])
    got = [r["url"] for r in read_urls_csv(p).take_all()]
    assert got == ["https://a.example.pl/x", "https://b.example.pl/y"]


def test_read_urls_csv_roundtrip(exported, tmp_path):
    res, out, _ = exported
    ds = read_urls_csv(os.path.join(out, "urls.csv"))
    assert sorted(r["url"] for r in ds.take_all()) == \
        sorted(res.table("urls")["offer_url"].to_pylist())


def test_read_urls_csv_missing_column(tmp_path, ray_session):
    p = str(tmp_path / "bad.csv")
    with open(p, "w", newline="") as f:
        csv.writer(f).writerows([["nope"], ["x"]])
    with pytest.raises(ValueError, match="offer_url/url/href"):
        read_urls_csv(p)


def test_export_debug_jsonl(tmp_path, ray_session):
    import json

    pcfg = PortalConfig(regions=("pomorskie",), base_pages=2,
                        page_size_scale=0.1)
    res = run_crawl(pcfg, CrawlConfig(urlseen_shards=2,
                                      urlseen_capacity=1 << 12,
                                      fetch_batch_size=64,
                                      fail_per_mille=150, fail_depth=9,
                                      fetch_attempts=3),
                    str(tmp_path / "run"))
    p = str(tmp_path / "debug.jsonl")
    from realestate_scraper_ray.pipelines.io_compat import export_debug_jsonl
    n = export_debug_jsonl(res, p)
    assert n == res.pages_failed > 0
    rows = [json.loads(line) for line in open(p)]
    assert len(rows) == n
    assert all(r["url"].startswith("https://") for r in rows)


def test_export_coverage_report(tmp_path, ray_session):
    import pandas as pd

    pcfg = PortalConfig(regions=("pomorskie",), base_pages=2,
                        page_size_scale=0.12)
    res = run_crawl(pcfg, CrawlConfig(urlseen_shards=2,
                                      urlseen_capacity=1 << 12,
                                      fetch_batch_size=64,
                                      fail_per_mille=120, fail_depth=9,
                                      fetch_attempts=3),
                    str(tmp_path / "run"))
    p = str(tmp_path / "coverage.csv")
    from realestate_scraper_ray.pipelines.io_compat import export_coverage_report
    cov = export_coverage_report(res, p)
    df = pd.read_csv(p, keep_default_na=False)
    assert len(df) == res.table("urls").num_rows
    # parsed rows have no reason; every miss has one
    assert (df.loc[df["parsed"], "wynik"] == "").all()
    assert (df.loc[~df["parsed"], "wynik"].isin(
        ["fetch_fail", "incomplete"])).all()
    # detail-page hard failures appear as fetch_fail misses
    q = set(res.table("quarantine")["url"].to_pylist())
    detail_failed = df["offer_url"].isin(q)
    assert (df.loc[detail_failed, "wynik"] == "fetch_fail").all()
    # per-source ratio matches the file
    for s, v in cov.items():
        part = df[df["source"] == s]
        assert abs(part["parsed"].mean() - v) < 1e-12
    assert 0 < min(cov.values()) <= max(cov.values()) <= 1


def test_export_debug_html(tmp_path, ray_session):
    from realestate_scraper_ray.pipelines.io_compat import export_debug_html
    from realestate_scraper_ray.sources.synth_portal import Portal

    pcfg = PortalConfig(regions=("pomorskie",), base_pages=2,
                        page_size_scale=0.1, html_bytes=20_000)
    res = run_crawl(pcfg, CrawlConfig(urlseen_shards=2,
                                      urlseen_capacity=1 << 12,
                                      fetch_batch_size=64,
                                      fail_per_mille=150, fail_depth=9,
                                      fetch_attempts=3),
                    str(tmp_path / "run"))
    out = str(tmp_path / "debug_html")
    n = export_debug_html(res, Portal(pcfg), out)
    assert n == res.pages_failed > 0
    files = sorted(os.listdir(out))
    assert files == [f"err_{i}.html" for i in range(n)] or \
        sorted(files, key=lambda s: int(s[4:-5])) == \
        [f"err_{i}.html" for i in range(n)]
    body = open(os.path.join(out, "err_0.html")).read()
    assert body.startswith("<!doctype") or "<html" in body
    assert len(body) > 10_000  # real page body, not a stub


def test_log_line_recovery_parser(ray_session):
    """M33 (cli.py:181-276): per-region done/last_page/stop_reason from
    live-all log lines — start/done markers, discover_page_done max,
    fetch-fail page recovered from the URL minus one, strict ERROR."""
    import json

    from realestate_scraper_ray.pipelines.io_compat import (
        recover_state_from_log)
    lines = [
        "[LIVE-ALL] start region=otodom:pomorskie",
        json.dumps({"msg": "discover_page_done", "level": "INFO",
                    "extra": {"page": 1}}),
        json.dumps({"msg": "discover_page_done", "level": "INFO",
                    "extra": {"page": 3}}),
        "[LIVE-ALL] done region=otodom:pomorskie",
        "[LIVE-ALL] start region=gratka:pomorskie",
        json.dumps({"msg": "discover_fetch_fail", "level": "ERROR",
                    "extra": {"url": "https://x.gratka.pl/mieszkania?page=7"}}),
        "[LIVE-ALL] start region=morizon:pomorskie",
        json.dumps({"msg": "discover_page_done", "level": "INFO",
                    "extra": {"page": 2}}),
        json.dumps({"msg": "something_else", "level": "ERROR", "extra": {}}),
        "[LIVE-ALL] done region=morizon:pomorskie",
    ]
    got = recover_state_from_log(lines)
    assert got["otodom:pomorskie"] == {
        "done": True, "last_page_done": 3, "stop_reason": None}
    assert got["gratka:pomorskie"] == {
        "done": False, "last_page_done": 6, "stop_reason": "fetch_fail"}
    assert got["morizon:pomorskie"]["done"] is True
    # strict mode: the ERROR line un-dones morizon
    strict = recover_state_from_log(lines, strict_errors=True)
    assert strict["morizon:pomorskie"]["done"] is False
    assert strict["otodom:pomorskie"]["done"] is True


def test_live_all_log_roundtrip_and_notifications(tmp_path, ray_session):
    """export_live_all_log → recover_state_from_log reproduces the
    crawl's terminal state; the S15 notification stream carries one
    apartment_id per offer in crawl order (backend.py:188-230)."""
    import json

    from realestate_scraper_ray.config import CrawlConfig, PortalConfig
    from realestate_scraper_ray.pipelines.crawl import run_crawl
    from realestate_scraper_ray.pipelines.io_compat import (
        export_live_all_log, export_offer_notifications,
        recover_state_from_log)
    pcfg = PortalConfig(regions=("pomorskie",), base_pages=2,
                        page_size_scale=0.15)
    res = run_crawl(pcfg, CrawlConfig(urlseen_shards=2,
                                      urlseen_capacity=1 << 14),
                    str(tmp_path / "wd"))
    log_path = str(tmp_path / "live_all.log")
    export_live_all_log(res, log_path)
    got = recover_state_from_log(open(log_path).read().splitlines())
    for key, st in res.state.items():
        r = got[key.replace("|", ":")]
        assert r["last_page_done"] == st["last_page_done"]
        assert r["done"] == (st["stop_reason"] != "fetch_fail")
    npath = str(tmp_path / "notify.jsonl")
    n = export_offer_notifications(res, npath)
    rows = [json.loads(x) for x in open(npath)]
    assert n == len(rows) == res.offers > 0
    offers = res.table("offers").to_pandas().sort_values(
        ["source", "region", "page_idx", "pos"], kind="stable")
    assert [r["apartment_id"] for r in rows] == list(offers["offer_id"])
    # backend.py:210-218: the body is EXACTLY {"apartment_id": id} —
    # a schema-strict consumer must accept every line
    assert all(set(r) == {"apartment_id"} for r in rows)


def test_delete_cheap_offers_correction(ray_session):
    """database_corrections/delete_cheap_offers.py semantics: stored
    offers below the 50k floor are removed, everything else intact."""
    import pyarrow as pa
    import ray.data as rd

    from realestate_scraper_ray.pipelines.io_compat import (
        delete_cheap_offers)
    t = pa.table({"offer_id": ["a", "b", "c"],
                  "price_amount": [49_999.0, 50_000.0, 750_000.0]})
    out = delete_cheap_offers(rd.from_arrow(t)).to_pandas()
    assert sorted(out["offer_id"]) == ["b", "c"]


def test_jsonl_shards_roundtrip_and_rerun_overwrites(ray_session, tmp_path):
    """write_jsonl_shards/read_jsonl_shards: unicode-exact round-trip,
    deterministic shard names (a re-run overwrites, never duplicates)."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from realestate_scraper_ray.pipelines.io_compat import (
        read_jsonl_shards, write_jsonl_shards,
    )

    t = pa.table({"doc_id": np.arange(6, dtype=np.int64),
                  "text": ["Zażółć gęślą", 'quote " and \\', "新聞",
                           "plain", "tab\tnewline\n", "é"],
                  "n": np.arange(6, dtype=np.int64) * 10})
    out = str(tmp_path / "jl")
    ds = rd.from_arrow(t).repartition(3)
    assert write_jsonl_shards(ds, out) == 6
    n_files = len(os.listdir(out))
    assert n_files >= 1
    back = read_jsonl_shards(out).take_all()
    want = sorted(t.to_pylist(), key=lambda r: r["doc_id"])
    assert sorted(back, key=lambda r: r["doc_id"]) == want
    # re-run: same shard names -> overwrite, not append
    assert write_jsonl_shards(ds, out) == 6
    assert len(os.listdir(out)) == n_files
    assert sorted(read_jsonl_shards(out).take_all(),
                  key=lambda r: r["doc_id"]) == want


def test_compact_fragments_roundtrip_and_resume(ray_session, tmp_path):
    """Fragment compaction: rows survive exactly, file count collapses,
    a re-run skips already-compacted bins."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from realestate_scraper_ray.pipelines.io_compat import compact_fragments

    src = tmp_path / "offers"
    rows = 0
    for gen in range(3):
        d = src / f"gen-{gen}"
        d.mkdir(parents=True)
        for i in range(10):
            n = 20 + i
            t = pa.table({"id": np.arange(rows, rows + n, dtype=np.int64),
                          "v": np.full(n, gen, dtype=np.int64)})
            pq.write_table(t, d / f"part-{i:03d}.parquet")
            rows += n
    out = tmp_path / "compacted"
    stats = compact_fragments(str(src), str(out), target_bytes=8_000)
    assert stats["files_in"] == 30 and stats["rows"] == rows
    assert stats["files_out"] < 30
    got = pq.read_table(sorted(str(p) for p in out.glob("*.parquet")))
    assert got.num_rows == rows
    assert sorted(got["id"].to_pylist()) == list(range(rows))
    # resume: identical re-run rewrites nothing
    again = compact_fragments(str(src), str(out), target_bytes=8_000)
    assert again["skipped"] == stats["files_out"] and again["rows"] == 0


def test_jsonl_shards_sweeps_orphaned_tmp_files(ray_session, tmp_path):
    """A killed write task leaves shard-*.jsonl.tmp-<uuid> behind; the
    next run's pre-sweep must remove them along with stale shards so
    the directory reflects exactly one run."""
    import os

    import ray.data as rd

    from realestate_scraper_ray.pipelines.io_compat import write_jsonl_shards

    out = tmp_path / "jl"
    out.mkdir()
    (out / "shard-dead.jsonl.tmp-deadbeef").write_text("junk")
    (out / "shard-stale.jsonl").write_text("junk")
    ds = rd.from_items([{"a": i} for i in range(5)])
    assert write_jsonl_shards(ds, str(out)) == 5
    left = os.listdir(out)
    assert not any(".tmp-" in f for f in left), left
    assert "shard-stale.jsonl" not in left
    rows = sum(1 for f in left for _ in open(out / f))
    assert rows == 5


def test_compact_fragments_invalidates_on_inplace_rewrite(ray_session,
                                                          tmp_path):
    """Bin identity folds in file SIZE: a fragment rewritten in place
    under the same name with different content must re-compact its bin
    instead of skipping and keeping stale rows."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from realestate_scraper_ray.pipelines.io_compat import compact_fragments

    src = tmp_path / "offers"
    d = src / "gen-0"
    d.mkdir(parents=True)
    for i in range(4):
        pq.write_table(
            pa.table({"v": np.arange(i * 10, i * 10 + 10, dtype=np.int64)}),
            d / f"part-{i}.parquet")
    out = tmp_path / "compacted"
    r1 = compact_fragments(str(src), str(out))
    assert r1["rows"] == 40 and r1["skipped"] == 0
    # unchanged re-run skips
    r2 = compact_fragments(str(src), str(out))
    assert r2["rows"] == 0 and r2["skipped"] >= 1
    # same name, new content (different size) -> bin must re-compact
    pq.write_table(pa.table({"v": np.arange(999, 999 + 25, dtype=np.int64)}),
                   d / "part-2.parquet")
    r3 = compact_fragments(str(src), str(out))
    assert r3["skipped"] == 0 and r3["rows"] == 30 + 25
    tot = sum(pq.read_table(f).num_rows
              for f in glob.glob(str(out / "*.parquet")))
    assert tot == 30 + 25
