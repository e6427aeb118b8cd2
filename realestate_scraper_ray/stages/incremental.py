"""Incremental (delta) aggregate maintenance with exactly-once
ingestion — the streaming-ingest complement to the batch catalog.

At 100 TB the corpus grows by daily crawl increments; recomputing a
grouped aggregate over the whole history per increment is O(history).
This stage keeps the aggregate as *mergeable partial state* on disk,
hash-partitioned by group key, and folds each new delta in by touching
ONLY the buckets the delta's groups hash into:

- state layout: ``{state_dir}/bucket=NN/part.parquet`` holding
  (key_cols…, n, s) partial rows, plus ``manifest.json`` listing the
  delta ids already applied (exactly-once: re-applying a delta id is a
  no-op, so a crashed-and-retried ingest never double-counts).
- update path: per-batch combiners reduce the delta to partial rows
  (one row per (block, group)), a bucket-key groupby co-locates each
  bucket's partials with a `map_groups` task that reads the bucket's
  existing parquet, merges (sum), and commits atomically (tmp +
  rename). Deltas never see unrelated buckets; state reads never see
  half-written files.
- read path: the state IS the aggregate — a streaming parquet read of
  the bucket files (partials are already fully merged per key).

The bucket count bounds per-task memory: a bucket holds
|groups| / n_buckets partial rows regardless of history length.
Crash safety: bucket files commit before the manifest records the
delta id, so a crash between the two re-applies the delta into
already-updated buckets — therefore the merge also stores, per bucket,
the set of delta ids it has folded (column-level idempotence), making
the retry a true no-op per bucket.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.sketches import splitmix64


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Stable bucket id for int64 group keys (splitmix64 — pure
    arithmetic, version-stable across library upgrades)."""
    return (splitmix64(keys.astype(np.uint64))
            % np.uint64(n_buckets)).astype(np.int64)


class IncrementalGroupSum:
    """Maintains SELECT key1, key2, COUNT(*), SUM(value) GROUP BY on
    disk, incrementally.  ``key_int`` (int64) drives bucketing; any
    additional string key columns ride along."""

    def __init__(self, state_dir: str, key_cols: list[str],
                 int_key: str, n_buckets: int = 16):
        self.state_dir = state_dir
        self.key_cols = key_cols
        self.int_key = int_key
        self.n_buckets = n_buckets
        os.makedirs(state_dir, exist_ok=True)

    # -- manifest -----------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, "manifest.json")

    def applied_deltas(self) -> list[str]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)["applied"]
        except FileNotFoundError:
            return []

    def _record_delta(self, delta_id: str) -> None:
        applied = self.applied_deltas() + [delta_id]
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"applied": applied}, f)
        os.replace(tmp, self._manifest_path())

    # -- update -------------------------------------------------------
    def update(self, delta: rd.Dataset, delta_id: str,
               partials_fn) -> bool:
        """Fold ``delta`` into the state.  ``partials_fn(batch) ->
        pa.Table`` must emit one (key_cols…, n, s) partial row per
        (batch, group).  Returns False if ``delta_id`` was already
        applied (exactly-once no-op)."""
        if delta_id in self.applied_deltas():
            return False
        state_dir, key_cols, int_key = \
            self.state_dir, self.key_cols, self.int_key
        nb = self.n_buckets

        def add_bucket(t: pa.Table) -> pa.Table:
            b = _bucket_of(t[int_key].to_numpy(), nb)
            return t.append_column("bucket", pa.array(b))

        def merge_bucket(g):
            import pandas as pd
            bucket = int(g["bucket"].iloc[0])
            bdir = os.path.join(state_dir, f"bucket={bucket:02d}")
            os.makedirs(bdir, exist_ok=True)
            path = os.path.join(bdir, "part.parquet")
            folded: list[str] = []
            frames = [g.drop(columns=["bucket"])]
            if os.path.exists(path):
                prev = pq.read_table(path)
                meta = prev.schema.metadata or {}
                folded = json.loads(meta.get(b"applied_deltas", b"[]"))
                if delta_id in folded:
                    # crash landed between this bucket's commit and the
                    # state-level manifest write: the retry is a no-op
                    return pd.DataFrame({"bucket": [bucket], "rows": [0]})
                frames.append(prev.to_pandas())
            merged = (pd.concat(frames, ignore_index=True)
                      .groupby(key_cols, as_index=False)[["n", "s"]].sum())
            out = pa.Table.from_pandas(merged, preserve_index=False)
            # the applied-delta list travels INSIDE the data file's
            # metadata — one rename commits data + idempotence marker
            # atomically (two separate files would leave a double-count
            # window between their renames)
            out = out.replace_schema_metadata(
                {b"applied_deltas": json.dumps(folded + [delta_id]).encode()})
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            pq.write_table(out, tmp)
            os.replace(tmp, path)
            return pd.DataFrame({"bucket": [bucket], "rows": [len(merged)]})

        (delta.map_batches(partials_fn, batch_format="pyarrow")
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(merge_bucket, batch_format="pandas")
              .materialize())  # drive the side-effecting writes
        self._record_delta(delta_id)
        return True

    # -- read ---------------------------------------------------------
    def read(self) -> rd.Dataset:
        """The maintained aggregate as a streaming Dataset (the state
        is already fully merged per key)."""
        paths = sorted(
            os.path.join(self.state_dir, d, "part.parquet")
            for d in os.listdir(self.state_dir)
            if d.startswith("bucket="))
        return rd.read_parquet(paths)
