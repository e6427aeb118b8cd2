"""Behavioral-analytics + grouping-set + robust-stat operators
(funnel, retention cohorts, CUBE, UNPIVOT, median/MAD outliers): each
engine path checked against an independent sequential brute-force twin
on a synthetic events table (the SQL-oracle parity runs separately via
tools/check_correctness.py / the driver)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from realestate_scraper_ray.pipelines.relational import QUERIES


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(11)
    n = 6000
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = ts0 + (np.sort(rng.integers(0, 12 * 86_400_000_000, n))
                .astype("timedelta64[us]"))
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, 180, n).astype(np.int64)),
        "event_type": pa.array(rng.choice(
            ["view", "click", "purchase", "error", "signup"], n,
            p=[0.45, 0.3, 0.1, 0.1, 0.05])),
        "value": pa.array(np.round(rng.normal(40, 15, n), 2)),
    })
    d = tmp_path_factory.mktemp("events_sf")
    pq.write_table(t, d / "events.parquet")
    return str(d), t.to_pandas()


def test_funnel_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["funnel_conversion"](sf)
    counts = {"view": 0, "click": 0, "purchase": 0}
    for _, g in df.sort_values("ts").groupby("user_id"):
        tv = g.loc[g.event_type == "view", "ts"].min()
        if pd.isna(tv):
            continue
        counts["view"] += 1
        tc = g.loc[(g.event_type == "click") & (g.ts > tv), "ts"].min()
        if pd.isna(tc):
            continue
        counts["click"] += 1
        tp = g.loc[(g.event_type == "purchase") & (g.ts > tc), "ts"].min()
        if not pd.isna(tp):
            counts["purchase"] += 1
    assert dict(zip(got["stage"], got["n_users"])) == counts
    assert list(got["stage_idx"]) == [1, 2, 3]


def test_retention_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["retention_cohorts"](sf)
    d = df.assign(day=df.ts.values.astype("datetime64[D]"))
    d0 = d.groupby("user_id")["day"].min().rename("d0")
    act = d[["user_id", "day"]].drop_duplicates().join(d0, on="user_id")
    act["off"] = (act["day"] - act["d0"]).dt.days
    exp = (act[(act.off >= 1) & (act.off <= 7)]
           .groupby([act.d0.astype(str), "off"]).size())
    got_map = {(r.cohort_day, r.day_offset): r.n_users
               for r in got.itertuples()}
    assert got_map == {(c, int(o)): int(v) for (c, o), v in exp.items()}


def test_cube_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["events_cube_counts"](sf)
    cents = np.round(df.value.to_numpy() * 100).astype(np.int64)
    days = df.ts.values.astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    base = pd.DataFrame({"event_type": df.event_type,
                         "dow": (days + 4) % 7, "cents": cents})
    frames = []
    for keys in (["event_type", "dow"], ["event_type"], ["dow"], []):
        if keys:
            g = base.groupby(keys, as_index=False).agg(
                n=("cents", "size"), cents_sum=("cents", "sum"))
        else:
            g = pd.DataFrame([{"n": len(base),
                               "cents_sum": cents.sum()}])
        if "event_type" not in g:
            g["event_type"] = "(all)"
        if "dow" not in g:
            g["dow"] = -1
        frames.append(g)
    exp = (pd.concat(frames, ignore_index=True)
           .astype({"dow": "int64", "n": "int64", "cents_sum": "int64"})
           .sort_values(["event_type", "dow"]).reset_index(drop=True)
           [["event_type", "dow", "n", "cents_sum"]])
    pd.testing.assert_frame_equal(got, exp)


def test_unpivot_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["events_unpivot_metrics"](sf)
    cents = np.round(df.value.to_numpy() * 100).astype(np.int64)
    g = (pd.DataFrame({"event_type": df.event_type, "c": cents})
         .groupby("event_type")["c"].agg(["size", "sum", "max"]))
    exp = {}
    for et, row in g.iterrows():
        exp[(et, "n_events")] = int(row["size"])
        exp[(et, "cents_sum")] = int(row["sum"])
        exp[(et, "cents_max")] = int(row["max"])
    got_map = {(r.event_type, r.metric): r.val for r in got.itertuples()}
    assert got_map == exp


def test_mad_outliers_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["events_mad_outliers"](sf)

    def med2(x):
        s = np.sort(x)
        n = len(s)
        return int(s[(n - 1) // 2]) + int(s[n // 2])

    for r in got.itertuples():
        c = np.round(df.loc[df.event_type == r.event_type, "value"]
                     .to_numpy() * 100).astype(np.int64)
        m2 = med2(c)
        dd = np.abs(2 * c - m2)
        m4 = med2(dd)
        assert r.med2 == m2 and r.mad4 == m4
        assert r.n_outliers == int((2 * dd > 3 * m4).sum())
        assert r.n == len(c)
    assert set(got.event_type) == set(df.event_type.unique())


def test_mad_odd_even_splits(ray_session, tmp_path):
    # minimal odd/even-count groups: the doubled-integer median must hit
    # the lo+hi definition exactly on both parities
    t = pa.table({
        "event_type": pa.array(["a"] * 3 + ["b"] * 4),
        "value": pa.array([1.0, 2.0, 10.0, 1.0, 2.0, 3.0, 100.0]),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["events_mad_outliers"](str(tmp_path))
    a = got[got.event_type == "a"].iloc[0]
    assert a.med2 == 2 * 200          # odd: med = 2.00 → med2 = 400
    b = got[got.event_type == "b"].iloc[0]
    assert b.med2 == 200 + 300        # even: (2.00 + 3.00) in cents


def test_intersect_except_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["users_intersect_except"](sf)
    d = df[(df.ts >= pd.Timestamp("2024-01-03"))
           & (df.ts < pd.Timestamp("2024-01-04"))]
    v = set(d.loc[d.event_type == "view", "user_id"])
    c = set(d.loc[d.event_type == "click", "user_id"])
    p = set(d.loc[d.event_type == "purchase", "user_id"])
    assert list(got["user_id"]) == sorted((v & c) - p)


def test_string_agg_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["events_string_agg_daily"](sf)
    d = df[df.event_type.isin(["signup", "purchase"])].copy()
    d["day"] = (d.ts.values.astype("datetime64[us]").astype("int64")
                // 86_400_000_000)
    exp = (d.sort_values("event_id").groupby(["event_type", "day"])
           ["event_id"].agg(lambda s: ",".join(map(str, s))))
    got_map = {(r.event_type, r.day): (r.id_list, r.n)
               for r in got.itertuples()}
    for (et, day), ids in exp.items():
        lst, n = got_map.pop((et, int(day)))
        assert lst == ids and n == ids.count(",") + 1
    assert not got_map


def test_skyline_kernel_bruteforce():
    from realestate_scraper_ray.pipelines.relational import _skyline2d
    rng = np.random.default_rng(9)
    for trial in range(5):
        p = rng.integers(0, 30, 400).astype(np.float64)
        q = rng.integers(0, 30, 400).astype(np.float64)
        keep = _skyline2d(p, q)
        dom = ((p[None, :] >= p[:, None]) & (q[None, :] <= q[:, None])
               & ((p[None, :] > p[:, None]) | (q[None, :] < q[:, None])))
        exp = ~dom.any(axis=1)
        np.testing.assert_array_equal(keep, exp)
    # duplicates of a frontier point all survive; empty input works
    p = np.array([10.0, 10.0, 5.0])
    q = np.array([1.0, 1.0, 0.5])
    assert _skyline2d(p, q).tolist() == [True, True, True]
    assert _skyline2d(np.array([]), np.array([])).tolist() == []


def test_skyline_combiner_is_sound(ray_session, tmp_path):
    # skyline(union) from per-block skylines equals one-shot skyline
    from realestate_scraper_ray.pipelines.relational import (
        QUERIES, _skyline2d)
    rng = np.random.default_rng(4)
    n = 3000
    t = pa.table({
        "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "l_linenumber": pa.array(np.ones(n, dtype=np.int64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(100, 9999, n), 2)),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype("float64")),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet", row_group_size=128)
    got = QUERIES["lineitem_skyline"](str(tmp_path))
    keep = _skyline2d(t["l_extendedprice"].to_numpy(),
                      t["l_quantity"].to_numpy())
    exp = set(t["l_orderkey"].to_numpy()[keep].tolist())
    assert set(got["l_orderkey"]) == exp


def test_scd2_classes_bruteforce(ray_session):
    # classify every key with the same md5 bucket rule and check the
    # version rows the merge must emit per class
    import hashlib
    got = QUERIES["customer_scd2"]("/root/testdata/sf0.001")
    rows = {}
    for r in got.itertuples():
        rows.setdefault(r.c_custkey, []).append(
            (r.valid_from, r.valid_to, r.c_acctbal))
    import duckdb
    cust = duckdb.sql(
        "SELECT c_custkey, c_acctbal FROM "
        "'/root/testdata/sf0.001/customer.parquet'").df()
    for k, bal in zip(cust.c_custkey, cust.c_acctbal):
        b = int(hashlib.md5(f"scd:{k}".encode()).hexdigest()[:6],
                16) % 1000
        vs = sorted(rows.pop(int(k), []))
        if b < 200:      # changed: close v0, open v1
            assert vs == [(0, 1, bal), (1, -1, bal + 100.0)]
        elif 900 <= b < 950:  # deleted: close v0
            assert vs == [(0, 1, bal)]
        elif b >= 950:   # inserted: open v1 only
            assert vs == [(1, -1, bal)]
        else:            # unchanged: one open version
            assert vs == [(0, -1, bal)]
    assert not rows


def test_transition_matrix_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["events_transition_matrix"](sf)
    d = df.sort_values(["user_id", "ts", "event_id"])
    prev, nxt = [], []
    for _, g in d.groupby("user_id"):
        types = g.event_type.to_list()
        prev.extend(types[:-1])
        nxt.extend(types[1:])
    exp = (pd.DataFrame({"prev_type": prev, "next_type": nxt})
           .groupby(["prev_type", "next_type"]).size())
    got_map = {(r.prev_type, r.next_type): r.n_pairs
               for r in got.itertuples()}
    assert got_map == {k: int(v) for k, v in exp.items()}
    # row-normalized: per prev_type the probabilities sum to 1 and each
    # equals count/total exactly
    tot = exp.groupby(level=0).sum()
    for r in got.itertuples():
        assert r.p_next == exp[(r.prev_type, r.next_type)] / tot[r.prev_type]


def test_documents_profile_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n = 800
    texts = [f"doc text {i % 97} {'x' * (i % 13)}" for i in range(n)]
    langs = rng.choice(["pl", "en", "de"], n).astype(object)
    srcs = rng.choice(["a", "b"], n).astype(object)
    # plant nulls + empty strings: null accounting and the empty-string
    # hash must both be exercised
    texts[5] = None
    texts[17] = ""
    langs[3] = None
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array((np.arange(n) % 29).astype(np.int64)),
    })
    pq.write_table(t, tmp_path / "documents.parquet", row_group_size=64)
    got = QUERIES["documents_profile"](str(tmp_path)).set_index("col")
    df = t.to_pandas()
    for col in ("doc_id", "text", "lang", "source", "n_chars"):
        s = df[col]
        r = got.loc[col]
        assert r.n_rows == n
        assert r.n_null == int(s.isna().sum())
        assert r.n_distinct == int(s.dropna().nunique())
        if col in ("doc_id", "n_chars"):
            assert r.min_num == float(s.min())
            assert r.max_num == float(s.max())
            assert np.isnan(r.avg_len)
        else:
            assert np.isnan(r.min_num) and np.isnan(r.max_num)
            assert r.avg_len == s.dropna().str.len().sum() / s.notna().sum()


def test_resample_gapfill_matches_bruteforce(ray_session, tmp_path):
    # plant real gaps: type "sparse" has events only on days 0 and 9,
    # type "late" starts on day 4 (leading nulls), "dense" fires daily
    rows = []
    day = 86_400_000_000
    eid = 0
    for d in range(10):
        rows.append(("dense", d * day + 1000, eid, float(d))); eid += 1
        # same-day tie: later (ts, event_id) must win
        rows.append(("dense", d * day + 1000, eid, float(d) + 0.5)); eid += 1
    for d in (0, 9):
        rows.append(("sparse", d * day + 5, eid, 100.0 + d)); eid += 1
    for d in range(4, 10):
        rows.append(("late", d * day + 7, eid, 200.0 + d)); eid += 1
    t = pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array(np.array([r[1] for r in rows], "datetime64[us]")),
        "event_id": pa.array(np.array([r[2] for r in rows], np.int64)),
        "value": pa.array([r[3] for r in rows]),
    })
    pq.write_table(t, tmp_path / "events.parquet", row_group_size=4)
    got = QUERIES["events_resample_gapfill"](str(tmp_path))
    assert len(got) == 3 * 10
    g = {(r.event_type, r.day): r.last_value for r in got.itertuples()}
    for d in range(10):
        ds_ = f"1970-01-{d + 1:02d}"
        assert g[("dense", ds_)] == d + 0.5        # tie broken by event_id
        assert g[("sparse", ds_)] == (100.0 if d < 9 else 109.0)  # ffill
        if d < 4:
            assert np.isnan(g[("late", ds_)])      # before series start
        else:
            assert g[("late", ds_)] == 200.0 + d


def test_type_cooccurrence_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["events_type_cooccurrence"](sf)
    ut = df[["user_id", "event_type"]].drop_duplicates()
    sets = ut.groupby("user_id")["event_type"].apply(set)
    n_users = len(sets)
    supp = ut.groupby("event_type").size()
    from itertools import combinations
    both = {}
    for s in sets:
        for a, b in combinations(sorted(s), 2):
            both[(a, b)] = both.get((a, b), 0) + 1
    got_map = {(r.type_a, r.type_b): (r.n_both, r.n_a, r.n_b, r.lift)
               for r in got.itertuples()}
    assert set(got_map) == set(both)
    for (a, b), n in both.items():
        nb, na, nbb, lift = got_map[(a, b)]
        assert (nb, na, nbb) == (n, supp[a], supp[b])
        assert lift == float(n * n_users) / float(supp[a] * supp[b])


def test_longest_streak_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["events_longest_streak"](sf)
    days = (df.assign(day=df.ts.values.astype("datetime64[D]")
                      .astype("int64"))
            [["user_id", "day"]].drop_duplicates())
    exp = {}
    for uid, g in days.groupby("user_id"):
        d = np.sort(g["day"].to_numpy())
        runs = np.split(d, np.where(np.diff(d) != 1)[0] + 1)
        exp[uid] = (len(d), max(len(r) for r in runs), len(runs))
    got_map = {r.user_id: (r.n_days, r.longest_streak, r.n_streaks)
               for r in got.itertuples()}
    assert got_map == exp


def test_waiting_suppliers_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(21)
    n_ord, n_sup = 400, 12
    od = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 90, n_ord).astype("timedelta64[D]").astype(
              "timedelta64[us]"))
    status = rng.choice(["F", "O", "P"], n_ord, p=[0.5, 0.25, 0.25])
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_orderstatus": pa.array(status),
        "o_orderdate": pa.array(od),
    }), tmp_path / "orders.parquet", row_group_size=64)
    n_li = 2200
    lok = rng.integers(0, n_ord, n_li).astype(np.int64)
    lsk = rng.integers(0, n_sup, n_li).astype(np.int64)
    ship = od[lok] + rng.integers(0, 120, n_li).astype(
        "timedelta64[D]").astype("timedelta64[us]")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lok), "l_suppkey": pa.array(lsk),
        "l_shipdate": pa.array(ship),
    }), tmp_path / "lineitem.parquet", row_group_size=128)
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_sup, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:03d}" for i in range(n_sup)]),
        "s_nationkey": pa.array((np.arange(n_sup) % 3).astype(np.int32)),
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(3, dtype=np.int32)),
        "n_name": pa.array(["POLAND", "GERMANY", "FRANCE"]),
    }), tmp_path / "nation.parquet")

    got = QUERIES["waiting_suppliers"](str(tmp_path))

    li = pd.DataFrame({"okey": lok, "skey": lsk, "ship": ship})
    om = pd.DataFrame({"okey": np.arange(n_ord), "st": status, "od": od})
    j = li.merge(om[om.st == "F"], on="okey")
    j["late"] = j.ship > j.od + np.timedelta64(60, "D")
    per = j.groupby(["okey", "skey"])["late"].any().reset_index()
    cnt = {}
    for okey, g in per.groupby("okey"):
        if len(g) >= 2 and g.late.sum() == 1:
            s = int(g.loc[g.late, "skey"].iloc[0])
            cnt[s] = cnt.get(s, 0) + 1
    exp = sorted(((f"Supplier#{s:03d}", v) for s, v in cnt.items()),
                 key=lambda x: (-x[1], x[0]))[:20]
    assert [(r.s_name, r.numwait) for r in got.itertuples()] == exp
    # nation names ride the supplier row
    for r in got.itertuples():
        s = int(r.s_name.split("#")[1])
        assert r.n_name == ["POLAND", "GERMANY", "FRANCE"][s % 3]


def test_user_profile_diff_matches_bruteforce(ray_session, tmp_path):
    from realestate_scraper_ray.pipelines.relational import _DIFF_CUT_US
    rng = np.random.default_rng(31)
    n = 4000
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = ts0 + rng.integers(0, 30 * 86_400_000_000, n).astype(
        "timedelta64[us]")
    uid = rng.integers(0, 120, n).astype(np.int64)
    # plant pure-A and pure-B users so 'added'/'removed' are exercised
    uid[ts.astype("int64") < _DIFF_CUT_US] = np.abs(
        uid[ts.astype("int64") < _DIFF_CUT_US]) % 100  # A-side: 0..99
    first_b = ts.astype("int64") >= _DIFF_CUT_US
    uid[first_b] = 20 + uid[first_b] % 100              # B-side: 20..119
    val = np.round(rng.normal(40, 15, n), 2)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts), "user_id": pa.array(uid),
        "event_type": pa.array(["view"] * n), "value": pa.array(val),
    }), tmp_path / "events.parquet", row_group_size=256)

    got = QUERIES["user_profile_diff"](str(tmp_path))
    df = pd.DataFrame({"uid": uid, "us": ts.astype("int64"),
                       "cents": np.rint(val * 100).astype(np.int64)})
    a = df[df.us < _DIFF_CUT_US].groupby("uid").agg(
        n=("cents", "size"), c=("cents", "sum"))
    b = df[df.us >= _DIFF_CUT_US].groupby("uid").agg(
        n=("cents", "size"), c=("cents", "sum"))
    exp = {}
    for u in sorted(set(a.index) | set(b.index)):
        na = int(a.n.get(u, 0)); nb = int(b.n.get(u, 0))
        ca = int(a.c.get(u, 0)); cb = int(b.c.get(u, 0))
        cls = ("added" if na == 0 else "removed" if nb == 0
               else "unchanged" if (na == nb and ca == cb) else "changed")
        exp[u] = (cls, na, nb, cb - ca)
    got_map = {u: (c, na_, nb_, d) for u, c, na_, nb_, d in zip(
        got["user_id"], got["class"], got["n_a"], got["n_b"],
        got["delta_cents"])}
    assert got_map == exp
    assert {"added", "removed", "changed"} <= {v[0] for v in exp.values()}


def test_grid_hotspots_matches_bruteforce(ray_session, events_dir):
    sf, df = events_dir
    got = QUERIES["events_grid_hotspots"](sf)
    us = df.ts.values.astype("int64")
    gx = us // 86_400_000_000
    gy = (us // 3_600_000_000) % 24
    cnt = pd.DataFrame({"gx": gx, "gy": gy}).groupby(
        ["gx", "gy"]).size().to_dict()
    assert {(r.gx, r.gy): r.n for r in got.itertuples()} == cnt
    for r in got.itertuples():
        exp = sum(cnt.get((r.gx + dx, r.gy + dy), 0)
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  if (dx, dy) != (0, 0))
        assert r.neigh_n == exp


def test_value_psi_matches_bruteforce(ray_session, events_dir):
    import math
    from realestate_scraper_ray.pipelines.relational import (
        _DIFF_CUT_US, _PSI_BINS)
    sf, df = events_dir
    got = QUERIES["events_value_psi"](sf)
    cents = np.rint(df.value.to_numpy() * 100).astype(np.int64)
    bins = np.clip(cents // 1000, -1, 9)
    in_a = df.ts.values.astype("int64") < _DIFF_CUT_US
    k = len(_PSI_BINS)
    na = {b: int(((bins == b) & in_a).sum()) for b in _PSI_BINS}
    nb = {b: int(((bins == b) & ~in_a).sum()) for b in _PSI_BINS}
    ta, tb = sum(na.values()), sum(nb.values())
    assert list(got["bin"]) == _PSI_BINS
    for r in got.itertuples():
        assert r.n_a == na[r.bin] and r.n_b == nb[r.bin]
        pa_ = (na[r.bin] + 1) / (ta + k)
        pb_ = (nb[r.bin] + 1) / (tb + k)
        assert r.psi_micro == math.floor(
            (pa_ - pb_) * math.log(pa_ / pb_) * 1_000_000)
    # PSI of a distribution against itself is ~0: every term is tiny
    # but non-negative by construction ((p-q)ln(p/q) >= 0)
    assert (got["psi_micro"] >= 0).all()


def test_fk_audit_counts_planted_orphans(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    # minimal star: lineitem -> orders/part/supplier, orders ->
    # customer, customer/supplier -> nation, nation -> region; plant
    # orphans on the lineitem->orders and orders->customer edges
    n_ord, n_li = 50, 300
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            np.where(np.arange(n_ord) % 10 == 0, 999,
                     np.arange(n_ord) % 5).astype(np.int64)),
    }), tmp_path / "orders.parquet")
    lok = rng.integers(0, n_ord + 8, n_li).astype(np.int64)  # 8 orphan keys
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lok),
        "l_partkey": pa.array(np.zeros(n_li, np.int64)),
        "l_suppkey": pa.array(np.zeros(n_li, np.int64)),
    }), tmp_path / "lineitem.parquet", row_group_size=64)
    pq.write_table(pa.table({
        "p_partkey": pa.array([0], pa.int64())}), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([0], pa.int64()),
        "s_nationkey": pa.array([0], pa.int32())}),
        tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(5, dtype=np.int64)),
        "c_nationkey": pa.array(np.zeros(5, np.int32))}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int32()),
        "n_regionkey": pa.array([0], pa.int32())}),
        tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int32())}),
        tmp_path / "region.parquet")

    got = QUERIES["fk_integrity_audit"](str(tmp_path)).set_index("fk_edge")
    lo = got.loc["lineitem.l_orderkey->orders"]
    orphan_mask = lok >= n_ord
    assert lo.n_rows == n_li
    assert lo.n_orphans == int(orphan_mask.sum())
    assert lo.n_keys == len(set(lok.tolist()))
    assert lo.n_orphan_keys == len(set(lok[orphan_mask].tolist()))
    oc = got.loc["orders.o_custkey->customer"]
    assert oc.n_orphans == 5 and oc.n_orphan_keys == 1  # the 999s
    clean = got.drop(["lineitem.l_orderkey->orders",
                      "orders.o_custkey->customer"])
    assert (clean.n_orphans == 0).all()
    assert (clean.n_orphan_keys == 0).all()
