"""In-process oracle verification for the driver-gate crawl queries.

The seven ``crawl_*`` rows in the driver's correctness gate have no
SQL-expressible oracle (no query over /root/testdata can describe a
crawl), so the driver records them rows-only. The engine≡oracle
equality evidence lives in pytest — invisible to the driver. This
module closes that gap: each crawl query runs its SEQUENTIAL oracle
twin in-process (`pipelines/oracle.py crawl_oracle`, the same
reference-behavior walk the pytest suite compares against — reference
scraper flow: listing walk `otodom.py:539-604`, detail parse
`detail.py:30-92`) and RETURNS the comparison as data — one row per
compared table: ``(table, rows_engine, rows_oracle, n_mismatch)`` —
after raising :class:`CrawlVerificationError` on any divergence. A
rows-only driver check therefore still fails loudly when the engine
drifts: the query errors instead of quietly returning rows.

Negative test: tests/test_registry.py::test_crawl_verification_flips
breaks an extractor and asserts the query raises.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "CrawlVerificationError",
    "comparison",
    "finish",
    "sequential_geocode_snap",
]


class CrawlVerificationError(AssertionError):
    """Engine output diverged from the in-process sequential oracle."""


def _mismatches(got: pd.DataFrame, exp: pd.DataFrame, keys: list[str],
                cols: list[str] | None) -> int:
    """Count row positions where engine and oracle disagree after a
    key sort: length difference + per-position value differences over
    the compared columns. Floats compare with pandas'
    assert_series_equal default tolerance (rtol 1e-5) — the engine and
    oracle agree exactly in practice, but the gate should not be
    stricter than the pytest suite it mirrors. Any divergence yields
    n_mismatch > 0; the count is a loudness signal, not a diff."""
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    use = [c for c in (cols or list(got.columns))
           if c in got.columns and c in exp.columns]
    overlap = min(len(got), len(exp))
    n = max(len(got), len(exp)) - overlap
    if overlap == 0 or not use:
        return n
    g, e = got.iloc[:overlap], exp.iloc[:overlap]
    bad = np.zeros(overlap, dtype=bool)
    for c in use:
        gc, ec = g[c], e[c]
        try:
            ec = ec.astype(gc.dtype)
        except (TypeError, ValueError):
            pass
        if pd.api.types.is_float_dtype(gc.dtype) \
                and pd.api.types.is_numeric_dtype(ec.dtype):
            gv = gc.to_numpy(dtype=np.float64)
            ev = ec.to_numpy(dtype=np.float64)
            bad |= ~(np.isclose(gv, ev, rtol=1e-5, atol=1e-8)
                     | (np.isnan(gv) & np.isnan(ev)))
        else:
            bad |= (gc.astype(str).to_numpy()
                    != ec.astype(str).to_numpy())
    return n + int(bad.sum())


def comparison(table: str, got: pd.DataFrame, exp: pd.DataFrame,
               keys: list[str], cols: list[str] | None = None) -> dict:
    """One verification row: engine frame vs oracle frame."""
    return {"table": table,
            "rows_engine": int(len(got)),
            "rows_oracle": int(len(exp)),
            "n_mismatch": int(_mismatches(got, exp, keys, cols))}


def set_comparison(table: str, got: set, exp: set) -> dict:
    """One verification row for set-valued outputs (URL-seen sets,
    quarantine membership): n_mismatch = symmetric difference."""
    return {"table": table,
            "rows_engine": int(len(got)),
            "rows_oracle": int(len(exp)),
            "n_mismatch": int(len(got ^ exp))}


def finish(query: str, rows: list[dict]) -> pd.DataFrame:
    """Assemble the verification frame; raise loudly on any mismatch
    so the driver's rows-only check flips to an error on divergence."""
    out = pd.DataFrame(rows, columns=["table", "rows_engine",
                                      "rows_oracle", "n_mismatch"])
    out = out.astype({"rows_engine": "int64", "rows_oracle": "int64",
                      "n_mismatch": "int64"})
    bad = out[out["n_mismatch"] > 0]
    if len(bad):
        raise CrawlVerificationError(
            f"{query}: engine diverged from the sequential oracle: "
            + "; ".join(f"{r.table}: {r.n_mismatch} mismatches "
                        f"(engine {r.rows_engine} vs oracle "
                        f"{r.rows_oracle} rows)"
                        for r in bad.itertuples()))
    return out.sort_values("table").reset_index(drop=True)


def sequential_geocode_snap(offers: pd.DataFrame,
                            max_dist_m: float = 800.0) -> pd.DataFrame:
    """Sequential twin of `stages/geo.py geocode_and_snap` (reference
    chain gratka.py:326-426 + >800 m snap morizon.py:472-487): per
    offer, walk street→district→city through synthetic_geocode with
    result verification, then snap when the resolved point is farther
    than ``max_dist_m``. Plain Python loop — the oracle side."""
    from ..stages.geo import (geocode_queries, geocode_result_matches,
                              haversine_m, synthetic_geocode)
    rows = []
    for r in offers.itertuples():
        street = getattr(r, "street", None)
        district = getattr(r, "district", None)
        lat, lon = float(r.lat), float(r.lon)
        pt, lvl = None, "none"
        for level, q in geocode_queries(street, district, r.city):
            res = synthetic_geocode(q)
            if res is None:
                continue
            if not geocode_result_matches(
                    level, street, district, r.city,
                    res[2] if len(res) > 2 else None):
                continue
            pt, lvl = (res[0], res[1]), level
            break
        snapped = False
        if pt is not None and not np.isnan(lat):
            d = float(haversine_m(lat, lon, pt[0], pt[1]))
            if d > max_dist_m:
                lat, lon = pt
                snapped = True
        rows.append({"offer_id": r.offer_id, "lat": lat, "lon": lon,
                     "geo_snapped": snapped, "geo_level": lvl})
    return pd.DataFrame(rows)
