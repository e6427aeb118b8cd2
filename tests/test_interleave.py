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


def test_interleaved_span_dedup_bruteforce(ray_session, tmp_path):
    """Engine span dedup vs a sequential twin: global keep-first on
    text spans, media exempt, re-offset rewrite, vanishing doc."""
    import numpy as np
    import pyarrow.parquet as pq

    # doc 1: dup text (kept: first), a media span, unique text
    # doc 2: same text as doc 1's first span (goes away), dup media (kept)
    # doc 3: ONLY duplicate text spans -> document vanishes entirely
    rows = [
        # user, ts(us), event_id, kind, props
        (1, 10, 100, "view", "T-dup"),
        (1, 20, 101, "view", "T-dup"),          # intra-doc dup, dropped
        (1, 30, 102, "purchase", "M-1"),
        (1, 40, 103, "click", "T-unique"),
        (2, 5, 104, "purchase", "M-1"),          # media dup: exempt, kept
        (2, 15, 105, "view", "T-dup"),           # loses to (1, off 0)
        (2, 25, 106, "purchase", "M-1"),         # exempt again
        (3, 1, 107, "view", "T-dup"),            # whole doc vanishes
    ]
    t = pa.table({
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array([r[4] for r in rows]),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    # NOTE: (1, ts=10) is globally first for "T-dup": user 1 < user 3
    # by packed (user_id, offset) order even though user 3's ts is
    # earlier — keep-first is position-keyed, not time-keyed.
    from realestate_scraper_ray.pipelines.relational import QUERIES
    got = {r.user_id: (r.n_spans, r.spans_fp)
           for r in QUERIES["interleaved_span_dedup"](
               str(tmp_path)).itertuples()}

    def fp(spans):
        s = ";".join(f"{k}|{tx}|{m}|{i}"
                     for i, (k, tx, m) in enumerate(spans))
        return hashlib.md5(s.encode()).hexdigest()

    want = {
        1: (3, fp([("view", "T-dup", ""), ("purchase", "", "M-1"),
                   ("click", "T-unique", "")])),
        2: (2, fp([("purchase", "", "M-1"), ("purchase", "", "M-1")])),
    }
    assert got == want
    assert 3 not in got  # fully-deduped doc vanishes
