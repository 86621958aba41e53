"""Multimodal (image/audio/video) stages — real plumbing, stubbed codecs.

Media are opaque ``binary`` columns with typed metadata (mime, width,
height, duration) — the engine's analogue of the reference's screenshot
Buffer -> S3 path (ScreenshotTransformer.ts:104-134). The decode kernels
themselves need codec libraries absent from this container, so:

- ``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
  ``ALLOW_FAKE_DECODE`` — the deterministic fake derives an 8x8 "pixel"
  grid from the payload bytes with the FNV-1a + splitmix64 arithmetic the
  rest of the engine uses, so (a) the Ray-side plumbing (schema, actor
  signature, batch sizing, output layout) is fully real and tested and
  (b) the whole stage is *replayable in SQL* via the u64 macro kernels
  (pipelines/oracle_kernels.py), turning the media driver rows into full
  value-hash-checked oracles instead of rows-only checks;
- ``MediaFeatureExtractor`` is the actor-pool stage shape for any real
  model: heavy init in ``__init__`` (once per actor), batched tensor work
  in ``__call__``, small ``batch_size`` because payload cells are large.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text_analysis import _mix64_np as _mix64  # shared splitmix64 kernel

ALLOW_FAKE_DECODE = True
FEATURE_DIM = 8

_FNV_INIT = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def fnv1a_bytes(payload: bytes) -> int:
    """FNV-1a over raw bytes (u64 wraparound) — the SQL-expressible seed
    for the stub codec (mirrored by oracle_kernels.U64_PRELUDE fnv1a)."""
    h = 0xCBF29CE484222325
    for b in payload:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a_bytes_bulk(payloads: list[bytes],
                     max_chunk_bytes: int = 1 << 24) -> np.ndarray:
    """Vectorized FNV-1a over a batch of byte strings: scatter into a
    padded (chunk, maxlen) uint8 matrix, one masked xor-multiply pass per
    byte position — no per-payload Python in the hot loop. Chunked along
    rows so the padded matrix stays <= ``max_chunk_bytes`` (16 MB default)
    however large the payload cells are; a single oversized payload only
    pads its own chunk."""
    n = len(payloads)
    out = np.empty(n, dtype=np.uint64)
    start = 0
    while start < n:
        stop, width = start, 1
        # grow the chunk until padded size (rows * running-max-len) caps
        while stop < n:
            w = max(width, len(payloads[stop]))
            if stop > start and (stop - start + 1) * w > max_chunk_bytes:
                break
            width, stop = w, stop + 1
        chunk = payloads[start:stop]
        m = len(chunk)
        lens = np.fromiter((len(b) for b in chunk), count=m, dtype=np.int64)
        mat = np.zeros((m, max(width, 1)), dtype=np.uint8)
        flat = np.frombuffer(b"".join(chunk), dtype=np.uint8)
        if flat.size:
            row = np.repeat(np.arange(m), lens)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            col = np.arange(flat.size) - np.repeat(starts, lens)
            mat[row, col] = flat
        h = np.full(m, _FNV_INIT, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(width):
                mm = lens > j
                h[mm] = (h[mm] ^ mat[mm, j]) * _FNV_PRIME
        out[start:stop] = h
        start = stop
    return out


def fnv1a_extend(h: np.ndarray, extra: np.ndarray) -> np.ndarray:
    """Continue FNV-1a folds: ``h`` (N,) u64 states x ``extra`` (N, B)
    uint8 byte rows -> new states. FNV is sequential, so folding the tail
    bytes onto a precomputed payload hash equals hashing
    ``payload + tail`` — lets callers avoid materializing concatenated
    payload copies (FrameSampler: one base hash per payload, 8 ts bytes
    per frame)."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        for j in range(extra.shape[1]):
            h = (h ^ extra[:, j].astype(np.uint64)) * _FNV_PRIME
    return h


def _grids_from_seeds(seeds: np.ndarray) -> np.ndarray:
    """(N,) u64 seeds -> (N, 8, 8) uint8 grids: cell i of seed h is
    ``mix64(h ^ (i+1)*GOLDEN) & 0xFF`` — pure u64 arithmetic, SQL-exact."""
    idx = (np.arange(64, dtype=np.uint64) + np.uint64(1))
    with np.errstate(over="ignore"):
        salts = idx * _GOLDEN
        cells = _mix64(seeds[:, None] ^ salts[None, :])
    return (cells & np.uint64(0xFF)).astype(np.uint8).reshape(-1, 8, 8)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Stub decode: a real build plugs PIL/cv2 here. The deterministic fake
    returns an 8x8 'pixel' grid seeded by FNV-1a of the payload bytes
    (cell arithmetic in _grids_from_seeds — SQL-replayable)."""
    if not ALLOW_FAKE_DECODE:
        raise NotImplementedError("image codec not available in this container")
    seed = np.asarray([fnv1a_bytes(payload)], dtype=np.uint64)
    return _grids_from_seeds(seed)[0]


def decode_images_bulk(payloads: list[bytes]) -> np.ndarray:
    """Batched stub decode: (N, 8, 8) grids via one vectorized FNV pass —
    element-identical to per-payload ``decode_image`` (pinned in tests)."""
    if not ALLOW_FAKE_DECODE:
        raise NotImplementedError("image codec not available in this container")
    return _grids_from_seeds(fnv1a_bytes_bulk(payloads))


def fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM float32 vector from payload bytes: column
    means of the stub grid in float64 (integer sums are exact; /8 is an
    exact binary scale; /255 is the single rounding step), then one cast to
    float32 — both roundings replay bit-identically in SQL
    (SUM/8.0/255.0 -> CAST AS REAL)."""
    img = decode_image(payload)
    base = img.astype(np.float64).mean(axis=0)
    return (base / 255.0).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: map_batches(MediaFeatureExtractor, concurrency=N,
    batch_size=small, num_cpus=1) over a MEDIA_SCHEMA table."""

    def __init__(self) -> None:
        # real build: load the vision model ONCE per actor here
        self.dim = FEATURE_DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in batch.column("payload").to_pylist()]
        seeds = fnv1a_bytes_bulk(payloads)
        grids = _grids_from_seeds(seeds)  # (N, 8, 8)
        base = grids.astype(np.float64).mean(axis=1)  # column means, (N, 8)
        feats = (base / 255.0).astype(np.float32)
        return (
            batch.drop_columns(["payload"])  # features flow on, blobs don't
            .append_column(
                "feature",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), FEATURE_DIM),
            )
            .append_column("payload_hash", pa.array(seeds, pa.uint64()))
        )


def media_table_from_documents(docs: pa.Table) -> pa.Table:
    """Build a synthetic media table from the documents table: payload =
    utf-8 text bytes, metadata derived deterministically. Exercises large
    binary cells through Arrow without real images."""
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    payloads = [t.encode() for t in texts]
    return pa.table(
        {
            "media_id": pa.array([f"m{did}" for did in ids], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * len(ids), pa.string()),
            "width": pa.array([(int(d) % 16 + 1) * 64 for d in ids], pa.int32()),
            "height": pa.array([(int(d) % 9 + 1) * 64 for d in ids], pa.int32()),
            "duration_ms": pa.array([0] * len(ids), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def extract_media_features(ds, concurrency: int = 2, batch_size: int = 64):
    """media Dataset -> features Dataset (actor pool; small batches because
    binary cells are wide)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        # fractional: a full-CPU pool equal to the session's CPU count
        # starves the feeding tasks (deadlocks small sessions)
        num_cpus=0.5,
        # restartable actors whose serialized ctor lives in the object store
        # can fail to restart after object loss (ray#53727); the stage is
        # cheap to rerun, so pin restarts off
        max_restarts=0,
    )


class ImageResizer:
    """Actor-pool resize stage: decode -> nearest-neighbor resample to
    (target_w, target_h) -> re-encoded payload + updated metadata.

    Real plumbing, stub codec: resampling runs on the stub-decoded pixel
    grid with the exact indexing a PIL ``Image.resize(..., NEAREST)``
    performs; a real build swaps ``decode_image``/``encode``. Small
    ``batch_size`` stays the rule — payload cells are wide."""

    def __init__(self, target_w: int = 4, target_h: int = 4) -> None:
        self.target_w = target_w
        self.target_h = target_h

    def _index_maps(self, h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
        # nearest-neighbor index maps (floor((i+0.5)*src/dst), PIL NEAREST)
        rows = np.minimum(((np.arange(self.target_h) + 0.5) * h
                           / self.target_h).astype(np.int64), h - 1)
        cols = np.minimum(((np.arange(self.target_w) + 0.5) * w
                           / self.target_w).astype(np.int64), w - 1)
        return rows, cols

    def _resize(self, img: np.ndarray) -> np.ndarray:
        rows, cols = self._index_maps(*img.shape[:2])
        return img[rows][:, cols]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in batch.column("payload").to_pylist()]
        grids = decode_images_bulk(payloads)  # (N, 8, 8)
        rows, cols = self._index_maps(grids.shape[1], grids.shape[2])
        small = grids[:, rows][:, :, cols]  # (N, th, tw)
        out_payload = [g.tobytes() for g in small]
        n = len(payloads)
        return (
            batch.set_column(batch.schema.get_field_index("payload"),
                             "payload", pa.array(out_payload, pa.binary()))
            .set_column(batch.schema.get_field_index("width"), "width",
                        pa.array([self.target_w] * n, pa.int32()))
            .set_column(batch.schema.get_field_index("height"), "height",
                        pa.array([self.target_h] * n, pa.int32()))
        )


class FrameSampler:
    """Actor-pool video frame-sampling stage: one row in -> ``fps``-spaced
    frame rows out (flat_map shape via map_batches row explosion).

    Stub codec: each sampled frame is the stub-decoded grid reseeded by
    (payload, frame_ts) — deterministic; a real build decodes the
    container and seeks. Output schema: (media_id, frame_idx, ts_ms,
    frame_payload) — frames flow on, source payloads don't."""

    def __init__(self, every_ms: int = 1000) -> None:
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = [p or b"" for p in batch.column("payload").to_pylist()]
        durations = batch.column("duration_ms").to_pylist()
        # base hash ONCE per payload; per-frame seeds extend the fold over
        # the 8 little-endian ts bytes (== hashing payload + ts_bytes, no
        # per-frame payload copies in memory)
        base = fnv1a_bytes_bulk(payloads)
        out_id, out_idx, out_ts, src_row = [], [], [], []
        for r, (mid, dur) in enumerate(zip(ids, durations)):
            n_frames = max(1, int(dur or 0) // self.every_ms + 1)
            for k in range(n_frames):
                out_id.append(mid)
                out_idx.append(k)
                out_ts.append(k * self.every_ms)
                src_row.append(r)
        ts_arr = np.asarray(out_ts, dtype=np.int64)
        tsb = np.zeros((ts_arr.size, 8), dtype=np.uint8)
        for j in range(8):
            tsb[:, j] = (ts_arr >> (8 * j)) & 0xFF
        seeds = fnv1a_extend(base[np.asarray(src_row, dtype=np.int64)], tsb)
        out_frame = [g.tobytes() for g in _grids_from_seeds(seeds)]
        return pa.table({
            "media_id": pa.array(out_id, pa.string()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "ts_ms": pa.array(out_ts, pa.int32()),
            "frame_payload": pa.array(out_frame, pa.binary()),
        })


def resize_images(ds, target_w: int = 4, target_h: int = 4,
                  concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        ImageResizer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5, max_restarts=0,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h})


def sample_frames(ds, every_ms: int = 1000, concurrency: int = 2,
                  batch_size: int = 64):
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5, max_restarts=0,
        fn_constructor_kwargs={"every_ms": every_ms})


def phash64_from_payloads(payloads: list[bytes]) -> np.ndarray:
    """Perceptual (average) hash per payload: bit i of the u64 is set
    when grid cell i is above the grid mean — the classic aHash over the
    decode stub's 8x8 grid. The mean test is the exact integer
    cross-multiply ``cell * 64 > sum`` (no division), so the whole hash
    replays in SQL; with a real codec the same bits come from the
    downscaled luma grid and nothing downstream changes."""
    seeds = np.array(fnv1a_bytes_bulk(payloads), dtype=np.uint64)
    if seeds.size == 0:
        return np.empty(0, dtype=np.uint64)
    grids = _grids_from_seeds(seeds).reshape(-1, 64).astype(np.int64)
    tot = grids.sum(axis=1)
    bits = (grids * 64 > tot[:, None]).astype(np.uint64)
    return (bits << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64)
