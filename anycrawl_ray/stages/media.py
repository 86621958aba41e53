"""Multimodal (image/audio/video) stages — real plumbing, stubbed codecs.

Media are opaque ``binary`` columns with typed metadata (mime, width,
height, duration) — the engine's analogue of the reference's screenshot
Buffer -> S3 path (ScreenshotTransformer.ts:104-134). The decode kernels
themselves need codec libraries absent from this container, so:

- ``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
  ``ALLOW_FAKE_DECODE`` — the deterministic fake derives features from the
  payload bytes (xxh64-seeded), so the Ray-side plumbing (schema, actor
  signature, batch sizing, output layout) is fully real and tested;
- ``MediaFeatureExtractor`` is the actor-pool stage shape for any real
  model: heavy init in ``__init__`` (once per actor), batched tensor work
  in ``__call__``, small ``batch_size`` because payload cells are large.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urls import xxh64

ALLOW_FAKE_DECODE = True
FEATURE_DIM = 8

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
    returns an 8x8 'pixel' grid seeded by the payload hash."""
    if not ALLOW_FAKE_DECODE:
        raise NotImplementedError("image codec not available in this container")
    rng = np.random.default_rng(xxh64(payload) & 0x7FFFFFFF)
    return rng.integers(0, 256, size=(8, 8), dtype=np.uint8)


def fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM float32 vector from payload bytes."""
    img = decode_image(payload)
    base = img.astype(np.float32).mean(axis=0)
    return (base / 255.0).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: map_batches(MediaFeatureExtractor, concurrency=N,
    batch_size=small, num_cpus=1) over a MEDIA_SCHEMA table."""

    def __init__(self) -> None:
        # real build: load the vision model ONCE per actor here
        self.dim = FEATURE_DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [fake_feature(p or b"") for p in payloads]
        hashes = [int(xxh64(p or b"")) for p in payloads]
        return (
            batch.drop_columns(["payload"])  # features flow on, blobs don't
            .append_column(
                "feature", pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float32(), FEATURE_DIM))
            )
            .append_column("payload_hash", pa.array(hashes, pa.uint64()))
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

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        # nearest-neighbor index maps (floor((i+0.5)*src/dst), PIL NEAREST)
        rows = np.minimum(((np.arange(self.target_h) + 0.5) * h
                           / self.target_h).astype(np.int64), h - 1)
        cols = np.minimum(((np.arange(self.target_w) + 0.5) * w
                           / self.target_w).astype(np.int64), w - 1)
        return img[rows][:, cols]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out_payload = []
        for p in payloads:
            small = self._resize(decode_image(p or b""))
            out_payload.append(small.tobytes())
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
        payloads = batch.column("payload").to_pylist()
        durations = batch.column("duration_ms").to_pylist()
        out_id, out_idx, out_ts, out_frame = [], [], [], []
        for mid, p, dur in zip(ids, payloads, durations):
            n_frames = max(1, int(dur or 0) // self.every_ms + 1)
            for k in range(n_frames):
                ts = k * self.every_ms
                frame = decode_image((p or b"") + ts.to_bytes(8, "little"))
                out_id.append(mid)
                out_idx.append(k)
                out_ts.append(ts)
                out_frame.append(frame.tobytes())
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
