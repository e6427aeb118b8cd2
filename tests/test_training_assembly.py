"""Training-set assembly operators (epoch shuffle, quantile gate,
temperature sampling, sequence packing) vs their DuckDB oracles at
sf0.001, plus semantic sanity checks that the oracles themselves can't
express (shard balance, packing contiguity)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def _run(name: str):
    from realestate_scraper_ray.pipelines.relational import ORACLE, QUERIES
    got = QUERIES[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = _oracle(ORACLE[name])
    cols = sorted(exp.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for c in cols:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy(),
                              equal_nan=(a[c].dtype.kind == "f")), c
    return a


def test_epoch_shuffle_matches_oracle():
    out = _run("epoch_shuffle")
    # Permutation property: every doc appears exactly once, and within
    # each shard positions are the contiguous 1..n_shard.
    assert out["doc_id"].is_unique
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))


def test_quality_quantile_filter_matches_oracle():
    out = _run("quality_quantile_filter")
    # A 75th-percentile gate keeps at most ~25% plus ties at the cutoff.
    assert 0 < len(out) <= 500
    assert len(out) <= 0.5 * 500


def test_source_temperature_sample_matches_oracle():
    out = _run("source_temperature_sample")
    # The gate must actually bite on the uniform 20x25 testdata
    # (rate ~= 0.125*sqrt(20) ~= 0.56), not cap out at keep-everything.
    assert 0 < len(out) < 500


def test_sequence_packing_matches_oracle():
    out = _run("sequence_packing")
    # Contiguity: offsets in doc_id order are the exclusive prefix sum.
    o = out.sort_values("doc_id").reset_index(drop=True)
    n = o["n_tokens"].to_numpy()
    expect = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert np.array_equal(o["tok_offset"].to_numpy(), expect)
    assert np.array_equal(o["pack_bin"].to_numpy(), expect // 2048)
