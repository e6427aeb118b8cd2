"""Z-order (Morton space-filling-curve) clustering for storage layout.

The lakehouse maintenance companion to ``io_compat.compact_fragments``:
rows are keyed by the bit-interleave of two quantized dimensions, so
range predicates on EITHER dimension touch a bounded band of z-buckets
(the property behind Delta/Iceberg ``OPTIMIZE ZORDER BY``). Public
technique (Morton 1966; Bayer's UB-tree line of work).

Two surfaces:
- ``morton_key`` / ``z_bucket`` — vectorized uint64 kernels, SQL-
  reproducible (pure integer arithmetic, so a DuckDB oracle can verify
  bucket stats bit-exactly);
- ``zorder_write`` — clustered, resumable parquet layout: one file per
  z-bucket written inside the reduce task (atomic tmp+rename,
  deterministic names, re-runs skip finished buckets).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

_SPREAD_MASKS = (
    (np.uint64(0x00FF00FF00FF00FF), np.uint64(8)),
    (np.uint64(0x0F0F0F0F0F0F0F0F), np.uint64(4)),
    (np.uint64(0x3333333333333333), np.uint64(2)),
    (np.uint64(0x5555555555555555), np.uint64(1)),
)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each uint64 onto even bit positions
    (classic magic-number bit dilation — no loop over bits)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    for mask, shift in _SPREAD_MASKS:
        x = (x | (x << shift)) & mask
    return x


def morton_key(x: np.ndarray, y: np.ndarray,
               x_div: int = 1, y_div: int = 1) -> np.ndarray:
    """32-bit Morton interleave of two quantized int columns: x on even
    bits, y on odd. ``x_div``/``y_div`` quantize wider domains down to
    16 bits (divisors are part of the layout contract so an oracle can
    recompute keys); quantized values must fit 16 bits — enforced, not
    wrapped, because silent wraparound would destroy locality."""
    qx = (x.astype(np.int64) // x_div).astype(np.uint64)
    qy = (y.astype(np.int64) // y_div).astype(np.uint64)
    if (qx >> np.uint64(16)).any() or (qy >> np.uint64(16)).any():
        raise ValueError("quantized key exceeds 16 bits; raise x_div/y_div")
    return _spread16(qx) | (_spread16(qy) << np.uint64(1))


def z_bucket(z: np.ndarray, n_bucket_bits: int = 6) -> np.ndarray:
    """Top-bits range bucket of a 32-bit morton key (contiguous z-range
    per bucket → a bucket is a rectangle-free but bounded region of the
    (x, y) plane)."""
    return (z >> np.uint64(32 - n_bucket_bits)).astype(np.int64)


def zorder_write(ds: rd.Dataset, out_dir: str, x_col: str, y_col: str,
                 *, x_div: int = 1, y_div: int = 1,
                 n_bucket_bits: int = 6) -> dict:
    """Rewrite ``ds`` clustered by z-bucket: one groupby on the bucket
    key, one parquet file per bucket written INSIDE the reduce task
    (rows sorted by full morton key within the file, atomic tmp+rename,
    deterministic ``z=NN.parquet`` names so a re-run skips finished
    buckets). Returns {files, rows, skipped}. 100 TB: bucket count is
    the task parallelism knob; no driver materialization."""
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if ".tmp-" in f:
            os.unlink(os.path.join(out_dir, f))

    def add_key(t: pa.Table) -> pa.Table:
        z = morton_key(t[x_col].to_numpy(zero_copy_only=False),
                       t[y_col].to_numpy(zero_copy_only=False),
                       x_div, y_div)
        return (t.append_column("_z", pa.array(z.view(np.int64)))
                 .append_column("_zb", pa.array(z_bucket(z, n_bucket_bits))))

    def write_bucket(t: pa.Table) -> pa.Table:
        zb = int(t["_zb"][0].as_py())
        path = os.path.join(out_dir, f"z={zb:02d}.parquet")
        if os.path.exists(path):
            return pa.table({"zb": pa.array([zb], pa.int64()),
                             "rows": pa.array([t.num_rows], pa.int64()),
                             "skipped": pa.array([1], pa.int64())})
        body = t.sort_by("_z").drop_columns(["_z", "_zb"])
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(body, tmp)
        os.replace(tmp, path)
        return pa.table({"zb": pa.array([zb], pa.int64()),
                         "rows": pa.array([t.num_rows], pa.int64()),
                         "skipped": pa.array([0], pa.int64())})

    stats = (ds.map_batches(add_key, batch_format="pyarrow")
             .groupby("_zb").map_groups(write_bucket, batch_format="pyarrow")
             .take_all())
    return {"files": len(stats),
            "rows": int(sum(r["rows"] for r in stats)),
            "skipped": int(sum(r["skipped"] for r in stats))}
