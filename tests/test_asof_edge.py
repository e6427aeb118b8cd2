"""events_asof_purchase edge case: a user group with NO 'purchase' rows
must yield all-NULL prev_purchase_value (like the ASOF LEFT JOIN
oracle), not crash — np.searchsorted against an empty right side used to
index an empty array. Masked in the shipped testdata (every user there
has a purchase), so exercised on a purpose-built table here."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from realestate_scraper_ray.pipelines.relational import events_asof_purchase


def test_asof_user_without_purchases(tmp_path, ray_session):
    ts = pd.to_datetime([
        "2026-01-01 10:00", "2026-01-01 11:00", "2026-01-01 12:00",  # u1
        "2026-01-01 10:30", "2026-01-01 11:30",                      # u2
    ]).astype("datetime64[us]")
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        # user 2 never purchases
        "event_type": ["view", "purchase", "view", "view", "click"],
        "value": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
        "props": ["{}"] * 5,
    })
    pq.write_table(t, tmp_path / "events.parquet")

    out = (events_asof_purchase(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    got = out["prev_purchase_value"].to_numpy()
    # u1: view@10 → NaN, purchase@11 → NaN (strict <), view@12 → 20.0
    # u2: both NaN (no purchases at all — the crash case)
    expect = np.array([np.nan, np.nan, 20.0, np.nan, np.nan])
    assert np.array_equal(got, expect, equal_nan=True)
