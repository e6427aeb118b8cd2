"""Multimodal columns: opaque `binary` payloads with typed metadata.

Images / audio / video travel as binary columns through Arrow batches
(`batch_format="pyarrow"`, which round-trips binary losslessly — pandas
would object-box it). Decode / feature-extraction is an **actor-pool
stage** (`map_batches(Cls, concurrency=N, batch_size=B)`): the codec /
model load happens once per actor in ``__init__``.

The decode libraries (PIL / ffmpeg / torchaudio) are NOT in this
container, so the actual pixel/sample decode is STUBBED: the default
``decoder="fake"`` derives deterministic metadata + features from the
bytes themselves (magic sniff + hashed pseudo-features), keeping the
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — real and tested. ``decoder="pil"`` raises NotImplementedError
unless PIL is importable (import-gated, never a hard dependency).

MIME sniffing mirrors the reference image pipeline
(/root/reference/scrapper/core/images.py:29-37 magic bytes; :23-27
content-type→ext map).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),    # image | audio | video
])

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg", "jpg"),
    (b"\x89PNG\r\n\x1a\n", "image/png", "png"),
    (b"RIFF", "image/webp", "webp"),     # RIFF....WEBP, checked below
    (b"ID3", "audio/mpeg", "mp3"),
    (b"OggS", "audio/ogg", "ogg"),
    (b"\x00\x00\x00", "video/mp4", "mp4"),  # ftyp boxes start with size
]


def sniff_mime(blob: bytes) -> tuple[str, str]:
    """Magic-byte sniff (images.py:29-37 semantics, extended to a/v)."""
    if blob.startswith(b"RIFF") and blob[8:12] == b"WEBP":
        return "image/webp", "webp"
    for magic, mime, ext in _MAGIC:
        if blob.startswith(magic):
            return mime, ext
    return "application/octet-stream", "bin"


class MediaDecode:
    """Actor-pool stage: binary payload → typed metadata + feature vector.

    __init__ runs once per actor (codec / model load); __call__ per
    batch. Output schema is stable regardless of decoder backend.
    """

    FEATURE_DIM = 16

    def __init__(self, decoder: str = "fake", feature_dim: int = 16):
        self.feature_dim = feature_dim
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError as e:  # pragma: no cover - lib absent here
                raise NotImplementedError(
                    "PIL decode backend requires pillow; use decoder='fake' "
                    "in this container") from e
        elif decoder != "fake":
            raise NotImplementedError(f"unknown decoder {decoder!r}")

    def _fake_decode(self, blob: bytes) -> tuple[int, int, np.ndarray]:
        """Deterministic stand-in for pixel decode: dimensions + features
        derived from a sha256 of the payload."""
        h = hashlib.sha256(blob).digest()
        width = 64 + int.from_bytes(h[0:2], "big") % 1984   # 64..2047
        height = 64 + int.from_bytes(h[2:4], "big") % 1984
        feats = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        reps = int(np.ceil(self.feature_dim / feats.size))
        feats = np.tile(feats, reps)[: self.feature_dim] / 255.0
        return width, height, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].combine_chunks().to_pylist()
        n = len(payloads)
        mimes, exts = [], []
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        sizes = np.zeros(n, dtype=np.int64)
        hashes = []
        feats = np.zeros((n, self.feature_dim), dtype=np.float32)
        for i, blob in enumerate(payloads):
            blob = blob or b""
            mime, ext = sniff_mime(blob)
            mimes.append(mime)
            exts.append(ext)
            sizes[i] = len(blob)
            hashes.append(hashlib.sha256(blob).hexdigest())
            w, h, f = self._fake_decode(blob)
            widths[i], heights[i] = w, h
            feats[i] = f
        return pa.table({
            "media_id": batch["media_id"],
            "mime": pa.array(mimes), "ext": pa.array(exts),
            "n_bytes": pa.array(sizes),
            "width": pa.array(widths), "height": pa.array(heights),
            "sha256": pa.array(hashes),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.feature_dim),
        })


class MediaResize:
    """Actor-pool stage stub: resize/frame-sample plumbing. Deterministic
    output dims; the pixel work is a NotImplementedError-gated backend."""

    def __init__(self, max_side: int = 512):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["width"], dtype=np.float64)
        h = np.asarray(batch["height"], dtype=np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return (batch
                .append_column("out_width", pa.array((w * scale).astype(np.int32)))
                .append_column("out_height", pa.array((h * scale).astype(np.int32))))


class MediaFrameSample:
    """Actor-pool stage: video/audio payload → N uniformly-sampled frame
    rows (one row OUT per frame, many per input row — the flat-map shape
    of frame extraction, expressed inside ``map_batches`` so binary
    columns stay zero-copy Arrow).

    Real deployments put the ffmpeg/decord handle in ``__init__`` (once
    per actor) and decode in ``__call__``; this container has no codec
    libs, so the default ``decoder="fake"`` derives deterministic frame
    payloads/timestamps from the input bytes — the schema, per-frame row
    expansion, ordering key (``frame_idx``) and batch sizing are the
    real, tested plumbing. Keep ``batch_size`` small: each input row
    fans out ``n_frames`` binary payloads, so output-batch memory is
    ~batch_size × n_frames × frame_bytes.
    """

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        self.n_frames = n_frames
        if decoder != "fake":
            raise NotImplementedError(
                "frame decode requires ffmpeg/decord; use decoder='fake' "
                "in this container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, ts, frames, w, h = [], [], [], [], [], []
        payloads = batch["payload"].combine_chunks().to_pylist()
        mids = batch["media_id"].to_pylist()
        for mid, blob in zip(mids, payloads):
            # hex-string derivation (not raw digests) so a SQL oracle can
            # reproduce every output column with sha256()/substr()
            base = hashlib.sha256(blob or b"").hexdigest()
            # fake "duration" from the payload, uniform sample positions
            dur_ms = 1000 + int(base[8:14], 16) % 599_000
            for f in range(self.n_frames):
                fh = hashlib.sha256((base + str(f)).encode()).hexdigest()
                ids.append(mid)
                idxs.append(f)
                ts.append((dur_ms * f) // max(1, self.n_frames))
                frames.append(bytes.fromhex(fh))  # stand-in frame bytes
                w.append(64 + int(fh[0:4], 16) % 1984)
                h.append(64 + int(fh[4:8], 16) % 1984)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_ts_ms": pa.array(ts, pa.int64()),
            "frame_payload": pa.array(frames, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
        })


def sample_frames(ds: rd.Dataset, n_frames: int = 4, concurrency: int = 4,
                  batch_size: int = 16) -> rd.Dataset:
    """Frame-sampling wiring: small input batches (each row fans out
    n_frames binary payloads), explicit actor pool, pyarrow end-to-end."""
    return ds.map_batches(MediaFrameSample,
                          fn_constructor_kwargs={"n_frames": n_frames},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def decode_media(ds: rd.Dataset, concurrency: int = 4,
                 batch_size: int = 64, decoder: str = "fake") -> rd.Dataset:
    """The canonical wiring: small batches (binary payloads are wide),
    actor pool sized explicitly, pyarrow end-to-end."""
    return ds.map_batches(MediaDecode, fn_constructor_kwargs={"decoder": decoder},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


MEDIA_OUT_COLS = ["offer_id", "seq", "url", "source", "mime", "ext",
                  "n_bytes", "sha256", "status", "local_path"]
MEDIA_OUT_SCHEMA = pa.schema([
    ("offer_id", pa.string()), ("seq", pa.int32()), ("url", pa.string()),
    ("source", pa.string()), ("mime", pa.string()), ("ext", pa.string()),
    ("n_bytes", pa.int64()), ("sha256", pa.string()),
    ("status", pa.string()),        # ok | failed (non-image payload)
    ("local_path", pa.string()),    # {root}/{source}/{offer_id}/{seq:03d}.{ext}
])


def media_download_rows(photos: pa.Table, fetch_bytes, root: str = "media",
                        attempts: int = 1, head_mime=None) -> pa.Table:
    """The reference's per-photo download chain
    (/root/reference/scrapper/core/images.py:48-91: HEAD→MIME gate→GET→
    magic sniff→sha256→atomic write to {source}/{offer_id}/{seq:03d}.{ext};
    asserted by its tests/test_images.py:19-43) as a batch kernel run
    inside the crawl wave: payload bytes never enter the object store —
    fetch, sniff and hash happen in the same task that holds the bytes,
    and only the typed metadata row flows on. Non-image payloads get
    status='failed' with no path/hash, like the reference's content-type
    rejection."""
    cols: dict[str, list] = {n: [] for n in MEDIA_OUT_COLS}
    for offer_id, seq, url, source in zip(
            photos["offer_id"].to_pylist(), photos["seq"].to_pylist(),
            photos["url"].to_pylist(), photos["source"].to_pylist()):
        # S2 HEAD→MIME gate (images.py:48-60): a non-image declared
        # content type rejects the photo WITHOUT transferring the body
        declared = head_mime(url) if head_mime is not None else None
        if declared is not None and not declared.startswith("image/"):
            cols["offer_id"].append(offer_id); cols["seq"].append(seq)
            cols["url"].append(url); cols["source"].append(source)
            cols["mime"].append(declared); cols["ext"].append(None)
            cols["n_bytes"].append(0); cols["sha256"].append(None)
            cols["status"].append("failed"); cols["local_path"].append(None)
            continue
        blob = None
        for _ in range(max(1, attempts)):
            blob = fetch_bytes(url)
            if blob is not None:
                break
        if blob is None:
            mime, ext, status, sha, path, nb = None, None, "failed", None, None, 0
        else:
            mime, ext = sniff_mime(blob)
            nb = len(blob)
            if mime.startswith("image/"):
                status = "ok"
                sha = hashlib.sha256(blob).hexdigest()
                path = photo_path(root, source, offer_id, int(seq), ext)
            else:
                status, sha, path = "failed", None, None
        cols["offer_id"].append(offer_id); cols["seq"].append(seq)
        cols["url"].append(url); cols["source"].append(source)
        cols["mime"].append(mime); cols["ext"].append(ext)
        cols["n_bytes"].append(nb); cols["sha256"].append(sha)
        cols["status"].append(status); cols["local_path"].append(path)
    return pa.Table.from_pydict(cols, schema=MEDIA_OUT_SCHEMA)


def photo_path(root: str, source: str, offer_id: str, seq: int, ext: str) -> str:
    """Deterministic media output layout
    ``{root}/{source}/{offer_id}/{seq:03d}.{ext}`` — the reference's
    photo_path (/root/reference/scrapper/core/storage.py:88-111,
    asserted by its test_images.py path check). Resumable by
    construction: a re-run overwrites the same path."""
    return f"{root}/{source}/{offer_id}/{seq:03d}.{ext}"


def synth_media_table(texts: list[str], ids: list[str],
                      variant: list[int] | None = None) -> pa.Table:
    """Deterministic fake payloads (JPEG/PNG/WebP magic + text bytes) —
    the test substrate for the media stages. ``variant`` selects each
    row's magic (defaults to the row's position, the original
    list-order behavior)."""
    payloads = []
    kinds = []
    magics = [b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"RIFF\x00\x00\x00\x00WEBP"]
    types = ["image", "image", "image"]
    for i, t in enumerate(texts):
        m = (variant[i] if variant is not None else i) % len(magics)
        payloads.append(magics[m] + (t or "").encode())
        kinds.append(types[m])
    return pa.table({"media_id": pa.array(ids), "payload": pa.array(payloads, pa.binary()),
                     "media_type": pa.array(kinds)})


def synth_media_batch(t: pa.Table) -> pa.Table:
    """map_batches form of :func:`synth_media_table` over a documents
    batch (doc_id, text): the payload is a pure per-row function of
    (doc_id, text), so synthesis streams inside the Dataset — nothing
    ever reaches the driver. The magic is keyed on ``doc_id % 3``
    (position-independent: batch boundaries can't change the result)."""
    ids = t["doc_id"].to_pylist()
    return synth_media_table(t["text"].to_pylist(),
                             [str(i) for i in ids],
                             variant=[int(i) for i in ids])
