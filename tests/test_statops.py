"""Statistical / preprocessing operators: mergeable-moments outliers,
sufficient-statistics OLS, random projection, text normalization.
Each engine path is checked against an independent sequential twin
(numpy / Python-int brute force), not just the SQL oracle."""

import math
import unicodedata

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from realestate_scraper_ray.functions.textstats import normalize_text
from realestate_scraper_ray.stages.similarity import rp_project, rp_sign_matrix


# ---------------------------------------------------------------------------
# normalize_text (no ray needed)
# ---------------------------------------------------------------------------

def test_normalize_text_nfc_and_whitespace():
    decomposed = "áb"  # a + combining acute
    out = normalize_text(pa.array([decomposed, "x\t\n  y ", " ok "]))
    assert out.to_pylist() == ["áb", "x y", "ok"]
    # NFC agrees with the stdlib on arbitrary text
    s = "Zaż́ółć gęślą jaźń é é"
    got = normalize_text(pa.array([s])).to_pylist()[0]
    ref = " ".join(unicodedata.normalize("NFC", s).split())
    assert got == ref


def test_normalize_text_keeps_nbsp_out_of_collapse():
    # RE2 \s is ASCII: U+00A0 must survive (the DuckDB oracle's
    # regexp_replace has the same semantics — parity depends on this)
    out = normalize_text(pa.array(["a b", "a  b"]))
    assert out.to_pylist() == ["a b", "a b"]


# ---------------------------------------------------------------------------
# mergeable-moments outlier detection
# ---------------------------------------------------------------------------

def test_outlier_zscore_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 4000
    types = rng.choice(["a", "b", "c"], n)
    vals = np.round(rng.normal(50, 10, n), 2)
    # plant unmistakable outliers
    vals[:5] = [500.0, -400.0, 999.99, 480.5, -390.25]
    tbl = pa.table({"event_id": np.arange(n, dtype=np.int64),
                    "event_type": types, "value": vals})
    import pyarrow.parquet as pq
    pq.write_table(tbl, tmp_path / "events.parquet")

    from realestate_scraper_ray.pipelines.relational import QUERIES
    got = QUERIES["events_outlier_zscore"](str(tmp_path)).take_all()
    got_ids = sorted(r["event_id"] for r in got)

    # sequential Python-int twin: |x·n − Σ| > isqrt(9(nΣΣ − Σ²))
    cents = np.round(vals * 100).astype(np.int64)
    want = []
    for tp in np.unique(types):
        m = types == tp
        c = [int(v) for v in cents[m]]
        nn, s, ss = len(c), sum(c), sum(v * v for v in c)
        k = math.isqrt(9 * (nn * ss - s * s))
        want += [int(i) for i in np.arange(n)[m]
                 if abs(int(cents[i]) * nn - s) > k]
    assert got_ids == sorted(want)
    assert set(range(5)) <= set(got_ids)  # planted outliers flagged


# ---------------------------------------------------------------------------
# sufficient-statistics OLS
# ---------------------------------------------------------------------------

def test_ols_trend_matches_polyfit_and_int_twin(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    n = 3000
    base = np.datetime64("2024-01-01T00:00:00", "s")
    ts = base + rng.integers(0, 90 * 86400, n).astype("timedelta64[s]")
    types = rng.choice(["up", "down"], n)
    x = ts.astype(np.int64)
    slope_true = np.where(types == "up", 2e-5, -3e-5)
    vals = np.round(10 + slope_true * (x - x.min())
                    + rng.normal(0, 0.5, n), 2)
    tbl = pa.table({"event_type": types,
                    "ts": ts.astype("datetime64[us]"), "value": vals})
    import pyarrow.parquet as pq
    pq.write_table(tbl, tmp_path / "events.parquet")

    from realestate_scraper_ray.pipelines.relational import QUERIES
    got = QUERIES["events_ols_trend"](str(tmp_path))
    got = {r.event_type: (r.n, r.slope_micro) for r in got.itertuples()}

    cents = np.round(vals * 100).astype(np.int64)
    x0 = int(x.min())
    for tp in ("up", "down"):
        m = types == tp
        xi = [int(v) - x0 for v in x[m]]
        yi = [int(v) for v in cents[m]]
        nn = len(xi)
        sx, sy = sum(xi), sum(yi)
        sxy = sum(a * b for a, b in zip(xi, yi))
        sxx = sum(a * a for a in xi)
        num, den = nn * sxy - sx * sy, nn * sxx - sx * sx
        slope = (1 if num >= 0 else -1) * (abs(1_000_000 * num) // den)
        assert got[tp] == (nn, slope)
        # micro-cents/s fixed point of the float fit, within the grid
        ls = np.polyfit(np.array(xi, dtype=np.float64),
                        np.array(yi, dtype=np.float64), 1)[0]
        assert abs(slope - ls * 1e6) <= 2.0


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------

def test_rp_project_exact_and_batch_invariant(ray_session):
    rng = np.random.default_rng(3)
    n, d, k = 120, 32, 8
    mat = rng.normal(0, 1, (n, d)).astype(np.float32)
    rows = pa.table({"vec_id": np.arange(n, dtype=np.int64),
                     "embedding": list(mat)})

    def run(blocks):
        ds = rd.from_arrow(rows).repartition(blocks)
        out = rp_project(ds, "embedding", "vec_id", k=k, dim=d).take_all()
        return {(r["vec_id"], r["proj_dim"]): r["proj"] for r in out}

    a, b = run(1), run(7)
    assert a == b  # batch-split invariant (int math, no accumulation order)
    signs = rp_sign_matrix(d, k)
    want = np.trunc(mat.astype(np.float64) * 1e6).astype(np.int64) @ signs
    assert all(a[(i, j)] == want[i, j] for i in range(n) for j in range(k))


def test_rp_project_preserves_distances_jl(ray_session):
    # JL sanity: with k=16 the projected (scaled) pairwise distances
    # track the originals.  iid Gaussian points all sit ~√(2d) apart
    # (no distance spread → correlation is pure noise), so give the
    # points wildly different norms to make distances vary for real.
    rng = np.random.default_rng(5)
    n, d, k = 80, 64, 16
    scales = np.exp(rng.uniform(-2, 2, n))[:, None]
    mat = (rng.normal(0, 1, (n, d)) * scales).astype(np.float32)
    ds = rd.from_arrow(pa.table({"vec_id": np.arange(n, dtype=np.int64),
                                 "embedding": list(mat)}))
    out = rp_project(ds, "embedding", "vec_id", k=k, dim=d).take_all()
    proj = np.zeros((n, k))
    for r in out:
        proj[r["vec_id"], r["proj_dim"]] = r["proj"] / 1e6
    m64 = mat.astype(np.float64)
    do = np.linalg.norm(m64[:, None] - m64[None, :], axis=2)[
        np.triu_indices(n, 1)]
    dp = (np.linalg.norm(proj[:, None] - proj[None, :], axis=2)
          / np.sqrt(k))[np.triu_indices(n, 1)]
    corr = np.corrcoef(do, dp)[0, 1]
    assert corr > 0.9
    # unbiased scale: mean ratio within 15 %
    assert 0.85 < np.mean(dp / do) < 1.15


# ---------------------------------------------------------------------------
# Efraimidis–Spirakis weighted sampling
# ---------------------------------------------------------------------------

def test_weighted_sample_es_bruteforce_and_bias(ray_session, tmp_path):
    import hashlib

    import pyarrow.parquet as pq

    n = 400
    ids = np.arange(n, dtype=np.int64)
    w = (1 + ids % 97).astype(np.int64) * 10  # varied weights
    pq.write_table(pa.table({"doc_id": ids, "text": ["x"] * n,
                             "n_chars": w}), tmp_path / "documents.parquet")

    from realestate_scraper_ray.pipelines.relational import QUERIES
    got = QUERIES["weighted_sample_es"](str(tmp_path))
    got_pairs = list(zip(got["doc_id"], got["key"]))

    M = float(1 << 52)
    keys = {}
    for d, wi in zip(ids, w):
        m = int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16)
        keys[int(d)] = int(np.trunc(
            1_000_000 * np.log((m + 0.5) / M) / wi))
    want = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got_pairs == want

    # ∝-weight bias: the sample's mean weight exceeds the corpus mean
    sample_w = w[np.isin(ids, got["doc_id"].to_numpy())]
    assert sample_w.mean() > w.mean() * 1.2


def test_weighted_sample_es_block_split_invariant(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(6)
    n = 300
    tbl = pa.table({"doc_id": np.arange(n, dtype=np.int64),
                    "text": ["x"] * n,
                    "n_chars": rng.integers(1, 5000, n).astype(np.int64)})
    # one row group vs many: the per-block top-k must merge identically
    pq.write_table(tbl, tmp_path / "documents.parquet", row_group_size=40)
    from realestate_scraper_ray.pipelines.relational import QUERIES
    a = QUERIES["weighted_sample_es"](str(tmp_path))
    (tmp_path / "documents.parquet").unlink()
    pq.write_table(tbl, tmp_path / "documents.parquet")
    b = QUERIES["weighted_sample_es"](str(tmp_path))
    assert a.equals(b)


def test_corr_value_time_matches_scipy_free_pearson(ray_session, tmp_path):
    """Engine r vs a numpy corrcoef twin (within the micro fixed-point
    grid), planted positive / negative / zero-variance groups."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    n = 2000
    base = np.datetime64("2024-01-01T00:00:00", "s")
    ts = base + rng.integers(0, 30 * 86400, n).astype("timedelta64[s]")
    x = ts.astype(np.int64).astype(np.float64)
    types = rng.choice(["pos", "neg", "flat"], n)
    vals = np.where(types == "pos", x * 1e-5, -x * 1e-5)
    vals = np.round(vals + rng.normal(0, 1.0, n), 2)
    vals[types == "flat"] = 7.0  # zero variance → r defined as 0
    pq.write_table(pa.table({"event_type": types,
                             "ts": ts.astype("datetime64[us]"),
                             "value": vals}), tmp_path / "events.parquet")
    from realestate_scraper_ray.pipelines.relational import QUERIES
    got = {r.event_type: r.r_micro for r in
           QUERIES["events_corr_value_time"](str(tmp_path)).itertuples()}
    for tp in ("pos", "neg"):
        m = types == tp
        want = np.corrcoef(x[m], np.round(vals[m] * 100))[0, 1]
        assert abs(got[tp] / 1e6 - want) < 1e-3
    assert got["pos"] > 500_000 and got["neg"] < -500_000
    assert got["flat"] == 0
