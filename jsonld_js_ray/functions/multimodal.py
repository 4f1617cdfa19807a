"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode/resize/frame-sample kernels themselves are STUBBED (image and
audio libraries are not in this container) behind ``NotImplementedError``
or a deterministic fake — but the Ray-side plumbing is real and tested:
typed binary columns + metadata, actor-pool ``map_batches`` signatures,
small ``batch_size`` for wide binary rows, Arrow-native batch formats
(binary columns must NOT round-trip through pandas object dtype)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..util_ray import default_concurrency

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthesize_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(["image", "audio", "video"], size=n)
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.tolist(), pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(rng.integers(16, 4096, n).astype("int32")),
        "height": pa.array(rng.integers(16, 4096, n).astype("int32")),
        "duration_ms": pa.array(rng.integers(0, 60000, n).astype("int32")),
    })


def _try_import_pil():
    """Optional-dependency probe: returns the PIL.Image module or None.
    Kept a function so actor __init__ does the import ONCE per actor."""
    try:
        from PIL import Image  # type: ignore
        return Image
    except ImportError:
        return None


HAS_PIL = _try_import_pil() is not None


def real_image_decode(payload: bytes, pil_image=None):
    """The real decode path, active when Pillow is installed in the
    deployment environment: decodes the payload, downsamples to an
    8×8 grayscale thumbnail and returns its 64 pixel intensities as
    float32 features (a perceptual-hash-style embedding). Without
    Pillow this raises — this sandbox has no imaging libs, so the
    pipeline default stays the deterministic stub."""
    pil_image = pil_image or _try_import_pil()
    if pil_image is None:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. "
            "Pillow/ffmpeg), not available in this environment — use "
            "the deterministic stub")
    import io
    img = pil_image.open(io.BytesIO(payload))
    thumb = img.convert("L").resize((8, 8))
    feats = np.asarray(thumb, dtype=np.float32).ravel() / 255.0
    return {"width": img.width, "height": img.height,
            "features": feats}


class DecodeFeatures:
    """Actor-pool stage: decode + feature-extract per media row.

    Real layout: per-actor decoder state in __init__ (codec tables /
    model weights), small batches because rows are wide binary. The stub
    computes deterministic pseudo-features (sha256-derived) so schema,
    batch sizes, and downstream layout are exercised end-to-end."""

    FEATURE_DIM = 16

    def __init__(self, use_stub: bool = True):
        self.use_stub = use_stub
        # optional dependency resolved ONCE per actor, not per batch
        self.pil = None if use_stub else _try_import_pil()
        if not use_stub and self.pil is None:
            raise NotImplementedError(
                "DecodeFeatures(use_stub=False) requires Pillow in the "
                "deployment environment")

    def _stub_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(digest[:self.FEATURE_DIM * 2], dtype=np.uint16)
        return (raw.astype(np.float32) / 65535.0)[:self.FEATURE_DIM]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, sizes = [], []
        for payload in payloads:
            if self.use_stub:
                feats.append(self._stub_features(payload))
            else:
                decoded = real_image_decode(payload, self.pil)
                feats.append(decoded["features"][:self.FEATURE_DIM])
            sizes.append(len(payload))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


def decode_features(media_ds, batch_size: int = 32, concurrency: int = 2):
    """Wide binary rows → SMALL batch_size so batch × concurrency fits a
    worker heap (guide: memory-aware batching)."""
    return media_ds.map_batches(
        DecodeFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency(concurrency), num_cpus=1)


class FrameSampler:
    """Video frame-sampling plumbing (stub): emits one row per sampled
    frame index — the 1→N explode shape a real sampler would have."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, ts_ms = [], [], []
        for mid, kind, dur in zip(batch.column("media_id").to_pylist(),
                                  batch.column("kind").to_pylist(),
                                  batch.column("duration_ms").to_pylist()):
            if kind != "video":
                continue
            for i, t in enumerate(range(0, max(1, dur), self.every_ms)):
                ids.append(mid)
                frame_idx.append(i)
                ts_ms.append(t)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "ts_ms": pa.array(ts_ms, pa.int32()),
        })


def sample_frames(media_ds, every_ms: int = 1000, batch_size: int = 32):
    return media_ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency(4), num_cpus=1)


class AudioChunker:
    """Audio chunking plumbing (stub kernel, real layout): splits each
    audio row into fixed-duration chunk rows with proportional byte
    ranges — the 1→N explode + byte-slicing shape a real resampler
    (ffmpeg/soundfile, not in this container) would have. Chunk payload
    slices stay zero-copy Arrow binary."""

    def __init__(self, chunk_ms: int = 5000):
        self.chunk_ms = chunk_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, starts, payloads = [], [], [], []
        for mid, kind, dur, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("duration_ms").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "audio":
                continue
            dur = max(1, dur)
            n_chunks = (dur + self.chunk_ms - 1) // self.chunk_ms
            n_bytes = len(payload)
            for i in range(n_chunks):
                lo = i * n_bytes // n_chunks
                hi = (i + 1) * n_bytes // n_chunks
                ids.append(mid)
                idxs.append(i)
                starts.append(i * self.chunk_ms)
                payloads.append(payload[lo:hi])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int32()),
            "start_ms": pa.array(starts, pa.int32()),
            "chunk": pa.array(payloads, pa.large_binary()),
        })


def chunk_audio(media_ds, chunk_ms: int = 5000, batch_size: int = 32):
    return media_ds.map_batches(
        AudioChunker, fn_constructor_kwargs={"chunk_ms": chunk_ms},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency(4), num_cpus=1)
