"""Interleaved-document assembly: nested structure, span order, and the
flat fingerprint twin the SQL oracle checks."""

import hashlib

import duckdb
import pyarrow as pa
import ray.data as rd

from realestate_scraper_ray.stages.interleave import (
    assemble_spans, span_fingerprints,
)

SF = "/root/testdata/sf0.001"


def _flat():
    # two docs; rows deliberately out of order to prove the sort
    return pa.table({
        "doc": ["a", "b", "a", "a", "b"],
        "kind": ["image", "text", "text", "image", "image"],
        "content": ["", "hello world", "title a", "", ""],
        "ref": ["img2.jpg", "", "", "img1.jpg", "b1.png"],
        "ord": [5, 0, 0, 3, 9],
    })


def test_assemble_spans_structure(ray_session):
    docs = assemble_spans(rd.from_arrow(_flat()), "doc", kind_col="kind",
                          text_col="content", media_col="ref",
                          order_cols=["ord"])
    rows = {r["doc"]: r["spans"] for r in docs.take_all()}
    assert set(rows) == {"a", "b"}
    a = rows["a"]
    assert [s["kind"] for s in a] == ["text", "image", "image"]
    assert [s["media_ref"] for s in a] == ["", "img1.jpg", "img2.jpg"]
    assert [s["offset"] for s in a] == [0, 1, 2]  # 0-based rank, not ord
    b = rows["b"]
    assert [(s["kind"], s["text"], s["media_ref"]) for s in b] == [
        ("text", "hello world", ""), ("image", "", "b1.png")]


def test_span_fingerprint_matches_manual(ray_session):
    docs = assemble_spans(rd.from_arrow(_flat()), "doc", kind_col="kind",
                          text_col="content", media_col="ref",
                          order_cols=["ord"])
    fp = {r["doc"]: (r["n_spans"], r["spans_fp"])
          for r in span_fingerprints(docs, "doc").take_all()}
    want_b = hashlib.md5(
        "text|hello world||0;image||b1.png|1".encode()).hexdigest()
    assert fp["b"] == (2, want_b)
    assert fp["a"][0] == 3


def test_events_interleaved_matches_duckdb(ray_session):
    from realestate_scraper_ray.pipelines.relational import ORACLE, QUERIES
    mine = QUERIES["events_interleaved_docs"](SF)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    orc = (con.execute(ORACLE["events_interleaved_docs"]).fetchdf()
           .sort_values("user_id").reset_index(drop=True))
    assert mine["n_spans"].tolist() == orc["n_spans"].tolist()
    assert mine["spans_fp"].tolist() == orc["spans_fp"].tolist()
