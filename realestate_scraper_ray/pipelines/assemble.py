"""End-to-end training-set ASSEMBLY with resumable sharded output.

The mixing/packing half of a training-data pipeline (pipelines/curate.py
is the cleaning half): documents → global-quantile quality gate (keep
n_tokens ≥ the exact 75th percentile, computed from a value-count
histogram — no global sort) → source temperature sampling (τ=2
flattening: keep-probability ∝ n_source^-0.5, decided by a content hash
against a per-source threshold, join-free on the fact side) → seeded
epoch shuffle (md5 order; shard = first hex digit, 16 shards) →
per-shard sequence packing (fixed token bins cut from an intra-shard
running prefix sum — shards pack independently, so packing needs no
cross-shard coordination at any scale).

Resumability mirrors ``pipelines/curate.py``: each shard commits
atomically (tmp + rename) and a re-run SKIPS shards whose file already
exists; ``manifest.json`` (written last) records the stage funnel and
per-shard rows, and its presence marks the output complete. The shard
key is content-derived (md5 of doc_id), so resuming with a different
input sharding produces byte-identical shards.

Per-stage semantics are exactly the SQL-oracled catalog queries
(`quality_quantile_filter`, `source_temperature_sample`,
`epoch_shuffle`, `sequence_packing` — relational.py), composed; the
`assembled_training_set` queries() entry checks the whole chain against
one composed DuckDB oracle.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count

OUT_COLS = ["doc_id", "source", "n_tokens", "shard", "pos", "pack_bin"]


def assemble_training_set(sf_dir: str, out_dir: str, *,
                          bin_tokens: int = 2048,
                          quantile: float = 0.75,
                          shard_hex_digits: int = 1) -> dict:
    """Run the assembly chain over ``{sf_dir}/documents.parquet`` and
    write packed shards to ``{out_dir}/shard=X/part.parquet``. Returns
    the manifest dict. Shards already on disk are skipped (resume).

    ``shard_hex_digits`` (k) sets the shard count to 16**k: the shard is
    the first k hex digits of the shuffle key, so each per-shard
    ``map_groups`` task holds 16**-k of the gated corpus — size k so one
    shard ~= one comfortable block at the target scale (k=1 → 16 shards
    fits the test corpora; 100 TB wants k≥5). Offsets, positions and
    pack bins are intra-shard, so every choice of k is deterministic
    for that k."""
    from ..functions.textstats import md5_fingerprints, token_counts

    os.makedirs(out_dir, exist_ok=True)
    # resume safety: skip-if-exists is only sound against shards written
    # with the SAME parameters. A different shard width leaves stale
    # shard dirs that read_assembled would union with the new ones
    # (silently duplicated corpus); different bin_tokens/quantile would
    # keep old-content shards beside new ones. Refuse loudly instead.
    stale = [d for d in os.listdir(out_dir)
             if d.startswith("shard=")
             and len(d) - len("shard=") != shard_hex_digits]
    if stale:
        raise ValueError(
            f"{out_dir} holds shards of a different width (e.g. "
            f"'{stale[0]}'); resuming with shard_hex_digits="
            f"{shard_hex_digits} would DUPLICATE the corpus in "
            "read_assembled — use a fresh out_dir or remove the stale "
            "shards")
    man_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            prev = json.load(f)
        for key, cur in (("shard_hex_digits", shard_hex_digits),
                         ("bin_tokens", bin_tokens),
                         ("quantile", quantile)):
            if key in prev and prev[key] != cur:
                raise ValueError(
                    f"{out_dir} was assembled with {key}={prev[key]}; "
                    f"re-running with {key}={cur} would mix shard "
                    "contents — use a fresh out_dir")
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])

    def tok(t: pa.Table) -> pa.Table:
        tc = token_counts(t["text"].combine_chunks())
        return t.append_column(
            "n_tokens", pc.cast(tc["n_tokens_ws"], pa.int64()))

    scored = ds.map_batches(tok, batch_format="pyarrow").materialize()
    # tok is row-preserving, so the input count reads off the already-
    # materialized blocks — a separate ds.count() would re-run the scan
    n_in = scored.count()

    # exact global quantile from the value-count histogram (token counts
    # are small ints, so the distinct-value set is tiny at any scale);
    # quantile_disc picks the sorted element at index floor((N-1)*q)
    # project to the key column before the shuffle — the groupby
    # exchanges every input column and the text must not ride it
    hist = (scored.select_columns(["n_tokens"])
            .groupby("n_tokens").aggregate(Count(alias_name="n"))
            .to_pandas().sort_values("n_tokens").reset_index(drop=True))
    total = int(hist["n"].sum())
    idx = int(np.floor((total - 1) * quantile))
    cum = hist["n"].cumsum().to_numpy()
    cutoff = int(hist["n_tokens"][int(np.searchsorted(cum, idx + 1))])
    gated = scored.filter(expr=f"n_tokens >= {cutoff}").materialize()
    n_gated = gated.count()

    # per-source τ=2 temperature thresholds (tiny table, task closure)
    counts = (gated.select_columns(["source"])
              .groupby("source").aggregate(Count(alias_name="n_g"))
              .to_pandas())
    n_total = float(counts["n_g"].sum())
    thr = {
        s: float(np.minimum(16777216.0,
                            np.floor(0.125 * np.sqrt(n_total)
                                     / np.sqrt(float(n)) * 16777216.0)))
        for s, n in zip(counts["source"], counts["n_g"])}

    def temp_gate(t: pa.Table) -> pa.Table:
        import polars as pl
        fp = md5_fingerprints(t["text"].combine_chunks())
        # vectorized hex prefix → uniform draw (polars Rust kernel, not
        # a per-row int(h[:6], 16) loop)
        u = (pl.from_arrow(fp).str.slice(0, 6).str.to_integer(base=16)
             .to_numpy().astype(np.float64))
        # per-source threshold via distinct-then-scatter
        srcs = t["source"].combine_chunks()
        uniq = pc.unique(srcs)
        lut = np.array([thr[s] for s in uniq.to_pylist()], np.float64)
        lim = lut[pc.index_in(srcs, value_set=uniq).to_numpy()]
        return (t.filter(pa.array(u < lim))
                .select(["doc_id", "source", "n_tokens"]))

    kept = gated.map_batches(temp_gate, batch_format="pyarrow")

    # epoch-shuffle key: md5('ep1:' || doc_id); shard = first k hex digits
    def shuffle_key(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.string())
        hv = md5_fingerprints(pc.binary_join_element_wise("ep1", ids, ":"))
        return (t.append_column("hv", hv)
                .append_column("shard", pc.utf8_slice_codeunits(
                    hv, 0, shard_hex_digits)))

    keyed = kept.map_batches(shuffle_key, batch_format="pyarrow")

    # per-shard: shuffle order = (hv, doc_id); pack bins from the
    # intra-shard exclusive prefix sum — shards pack independently
    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hv", "doc_id"]).reset_index(drop=True)
        ntok = g["n_tokens"].to_numpy(dtype=np.int64)
        off = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"], "source": g["source"],
            "n_tokens": ntok, "shard": g["shard"],
            "pos": np.arange(1, len(g) + 1, dtype=np.int64),
            "pack_bin": off // bin_tokens})

    # each shard's map_groups task packs AND writes its own file
    # (atomic tmp + rename, skip-if-exists) — the write scales with the
    # shard count, and only (shard, rows, written) rows reach the driver
    def pack_and_write(g: pd.DataFrame) -> pd.DataFrame:
        out = pack(g)
        shard = str(out["shard"].iloc[0])
        wrote = _write_shard(out_dir, shard, out)
        return pd.DataFrame({"shard": [shard],
                             "rows": [np.int64(len(out))],
                             "wrote": [wrote]})

    summary = (keyed.groupby("shard")
               .map_groups(pack_and_write, batch_format="pandas")
               .to_pandas())
    rows = dict(zip(summary["shard"], summary["rows"].astype(int)))
    written = sorted(summary["shard"][summary["wrote"]])
    skipped = sorted(summary["shard"][~summary["wrote"]])

    manifest = {
        "n_in": int(n_in), "n_after_quality": int(n_gated),
        "n_after_temperature": int(sum(rows.values())),
        "quantile_cutoff_tokens": cutoff, "bin_tokens": bin_tokens,
        "quantile": quantile, "shard_hex_digits": shard_hex_digits,
        "shard_rows": {k: int(v) for k, v in sorted(rows.items())},
        "written": sorted(written), "skipped": sorted(skipped),
    }
    tmp = os.path.join(out_dir, f"manifest.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def _write_shard(out_dir: str, shard: str, df: pd.DataFrame) -> bool:
    """Atomically write one shard's file from inside its task; returns
    False (skip) when the file already exists (resume)."""
    sdir = os.path.join(out_dir, f"shard={shard}")
    dest = os.path.join(sdir, "part.parquet")
    if os.path.exists(dest):
        return False
    os.makedirs(sdir, exist_ok=True)
    tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(
        pa.Table.from_pandas(df.sort_values("pos")[OUT_COLS],
                             preserve_index=False), tmp)
    os.replace(tmp, dest)
    return True


def read_assembled(out_dir: str) -> rd.Dataset:
    """Streaming reader over the assembled output (all shards)."""
    files = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "part.parquet")
        if d.startswith("shard=") and os.path.exists(p):
            files.append(p)
    return rd.read_parquet(files)
