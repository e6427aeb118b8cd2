"""As-of and band (range) join operators vs the DuckDB oracle at
sf0.001 — the custom-operator compositions (groupby on the equality
key + vectorized searchsorted in map_groups) must match the SQL
semantics exactly."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con.sql(sql).df()


def _check(name: str):
    from realestate_scraper_ray.pipelines.relational import ORACLE, QUERIES

    got = QUERIES[name](SF).to_pandas()
    exp = _oracle(ORACLE[name])
    assert sorted(got.columns) == sorted(exp.columns)
    a = got.sort_values("event_id").reset_index(drop=True)[sorted(got.columns)]
    b = exp.sort_values("event_id").reset_index(drop=True)[sorted(exp.columns)]
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert np.array_equal(av, bv, equal_nan=(a[c].dtype.kind == "f")), c


def test_asof_purchase_matches_oracle():
    _check("events_asof_purchase")


def test_range_join_matches_oracle():
    _check("events_range_join")
