"""End-to-end corpus curation with RESUMABLE partitioned output.

The user-facing training-data pipeline: quality gate → exact dedup
(md5 keep-first) → near-dup cluster dedup (exact n-gram Jaccard →
connected components → min-id survivor) → write the surviving corpus
as hash-partitioned parquet, one directory per bucket, plus a manifest.

Resumability (the property a 100-TB run cannot live without): output
is partitioned by ``splitmix64(doc_id) % n_buckets`` (version-stable
pure-arithmetic key); each bucket commits
atomically (tmp + rename), and a re-run SKIPS buckets whose file
already exists — a failed run resumes by rewriting only the missing
buckets. Partitioning is content-keyed, so resuming with a different
input sharding produces byte-identical buckets. The manifest
(``manifest.json``, written last) records per-bucket row counts and the
funnel (rows in → after quality gate → after exact dedup → after
near-dup), and its presence marks the output complete.

The per-stage semantics are exactly the SQL-oracled catalog queries
(`documents_clean_corpus`, `dedup_corpus_survivors` — relational.py),
composed; pytest asserts the funnel and the resume-skip behavior.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Min


def curate_corpus(sf_dir: str, out_dir: str, n_buckets: int = 16,
                  jaccard_threshold: float = 0.6) -> dict:
    """Run the curation chain over ``{sf_dir}/documents.parquet`` and
    write surviving docs to ``{out_dir}/bucket=NN/part.parquet``.
    Returns the manifest dict. Buckets already present on disk are
    skipped (resume); delete ``manifest.json`` + partial buckets to
    redo them."""
    from ..functions.textstats import md5_fingerprints, quality_stats
    from ..stages.dedupe import ngram_jaccard_pairs
    from ..stages.graph import connected_components
    from ..stages.joins import semi_join

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])
    n_in = ds.count()

    def gate(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        q = quality_stats(txt)
        keep = pc.and_(pc.greater_equal(q["n_words"], 40),
                       pc.less_equal(pc.cast(q["n_punct"], pa.float64()),
                                     pc.multiply(pc.cast(q["n_chars_m"],
                                                         pa.float64()), 0.2)))
        return t.append_column("fp", md5_fingerprints(txt)).filter(keep)

    gated = ds.map_batches(gate, batch_format="pyarrow").materialize()
    n_gated = gated.count()

    # project to (fp, doc_id) BEFORE the content-hash shuffle — the
    # groupby exchanges every column of its input, and shipping the
    # text corpus to pick a min-id per hash is the classic all-to-all
    # waste (16 bytes/row moves instead of the whole document)
    canon = (gated.select_columns(["fp", "doc_id"])
             .groupby("fp").aggregate(Min("doc_id", alias_name="doc_id")))
    exact = semi_join(gated, canon.select_columns(["doc_id"]),
                      "doc_id", "doc_id").materialize()
    n_exact = exact.count()

    pairs = ngram_jaccard_pairs(exact.select_columns(["doc_id", "text"]),
                                "text", "doc_id",
                                threshold=jaccard_threshold)
    edges = rd.from_arrow(pa.table({
        "id_a": pa.array(pairs["id_a"].to_numpy(), pa.int64()),
        "id_b": pa.array(pairs["id_b"].to_numpy(), pa.int64())}))
    cc = connected_components(exact.select_columns(["doc_id"]), edges,
                              "doc_id")
    survivors = semi_join(
        exact,
        cc.map_batches(
            lambda t: t.filter(pc.equal(t["doc_id"], t["component"]))
                       .select(["doc_id"]), batch_format="pyarrow"),
        "doc_id", "doc_id")

    def add_bucket(t: pa.Table) -> pa.Table:
        # content-keyed bucket via a vectorized splitmix64 finalizer —
        # pure uint64 numpy arithmetic, so the key is independent of
        # any library's hash implementation: buckets written by one
        # environment resume identically in a rebuilt one (the
        # guarantee a polars/xxh3 hash can't make across versions, and
        # a per-row Python md5 loop paid dearly for)
        x = np.asarray(t["doc_id"]).astype(np.uint64)
        with np.errstate(over="ignore"):
            x = x + np.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
        b = (x % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    bucketed = survivors.map_batches(add_bucket, batch_format="pyarrow")

    # each bucket's map_groups task writes its own file (atomic tmp +
    # rename, skip-if-exists) — the write scales with the bucket count
    # and only (bucket, rows, wrote) summary rows reach the driver
    def write_bucket(t: pa.Table) -> pa.Table:
        bucket = int(t["bucket"][0].as_py())
        bdir = os.path.join(out_dir, f"bucket={bucket:02d}")
        dest = os.path.join(bdir, "part.parquet")
        wrote = False
        if not os.path.exists(dest):
            os.makedirs(bdir, exist_ok=True)
            tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(t.sort_by("doc_id").select(
                ["doc_id", "text", "source"]), tmp)
            os.replace(tmp, dest)
            wrote = True
        return pa.table({"bucket": pa.array([bucket], pa.int32()),
                         "rows": pa.array([t.num_rows], pa.int64()),
                         "wrote": pa.array([wrote])})

    summary = (bucketed.groupby("bucket")
               .map_groups(write_bucket, batch_format="pyarrow")
               .to_pandas())
    counts = dict(zip(summary["bucket"].astype(int),
                      summary["rows"].astype(int)))
    written = sorted(int(b) for b in summary["bucket"][summary["wrote"]])
    skipped = sorted(int(b) for b in summary["bucket"][~summary["wrote"]])

    manifest = {
        "n_in": int(n_in), "n_after_quality": int(n_gated),
        "n_after_exact": int(n_exact),
        "n_survivors": int(sum(counts.values())),
        "n_buckets": n_buckets,
        "bucket_rows": {str(k): int(v) for k, v in sorted(counts.items())},
        "written": sorted(written), "skipped": sorted(skipped),
    }
    tmp = os.path.join(out_dir, f"manifest.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def read_curated(out_dir: str) -> rd.Dataset:
    """Streaming reader over the curated output (all buckets)."""
    files = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "part.parquet")
        if d.startswith("bucket=") and os.path.exists(p):
            files.append(p)
    return rd.read_parquet(files)
