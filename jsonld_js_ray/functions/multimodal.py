"""Multimodal columns (image/audio/video as typed binary).

Two lanes share the same Ray plumbing (typed binary columns + metadata,
actor-pool ``map_batches``, small ``batch_size`` for wide binary rows,
Arrow-native batch formats — binary columns must NOT round-trip through
pandas object dtype):

- REAL lane: stdlib codecs that need no external library — 24-bit
  uncompressed BMP (struct + numpy) and PCM16 WAV (`wave`) — drive
  ``DecodeFeatures(use_stub=False, codec="bmp")`` and
  ``AudioChunker(codec="wav")`` end-to-end, including in this
  container's CI and driver gate.
- STUB lane: every other format (PNG/JPEG/MP4/...) needs Pillow/ffmpeg,
  absent here; those kernels raise ``NotImplementedError`` loudly or
  run a deterministic sha-derived fake so schema/batching/layout stay
  exercised."""

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


def synthesize_bmp(width: int, height: int, seed: int = 7) -> bytes:
    """A REAL, valid 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up, 4-byte row padding) from seeded pixels — stdlib only.
    Gives the real-decode lane a genuine encoded image format that
    needs no imaging library."""
    import struct
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    row_size = (width * 3 + 3) & ~3
    img_size = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0,
                         14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      img_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        # BMP stores BGR
        rows.append(px[y, :, ::-1].tobytes() + pad)
    return header + dib + b"".join(rows)


def decode_bmp(payload: bytes) -> dict:
    """Decode a 24-bit uncompressed BMP with the stdlib (struct) +
    numpy — no imaging library. Returns width/height and an (H, W, 3)
    RGB uint8 array."""
    import struct
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height, _planes, bpp, compression = \
        struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"stdlib BMP decoder handles 24bpp uncompressed only "
            f"(got bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=row_size * height, offset=offset)
    rows = raw.reshape(height, row_size)[:, :width * 3] \
        .reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return {"width": width, "height": height,
            "pixels": rows[:, :, ::-1]}  # BGR -> RGB


def _thumb_features(pixels: np.ndarray) -> np.ndarray:
    """8×8 grayscale block-mean thumbnail → 64 float32 features (the
    perceptual-hash-style embedding of the real lane), pure numpy."""
    gray = (0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1]
            + 0.114 * pixels[:, :, 2])
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    out = np.empty((8, 8), dtype=np.float32)
    for i in range(8):
        for j in range(8):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean()
    return out.ravel() / np.float32(255.0)


def synthesize_wav(duration_ms: int, rate: int = 8000,
                   seed: int = 7) -> bytes:
    """A REAL, valid PCM16 mono WAV of the given duration from seeded
    noise — stdlib `wave` only."""
    import io
    import wave
    rng = np.random.default_rng(seed)
    n = max(1, rate * duration_ms // 1000)
    samples = rng.integers(-2 ** 14, 2 ** 14, size=n,
                           dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Decode a PCM WAV with the stdlib `wave` module — no audio
    library. Returns rate, frame count, duration_ms, and the samples
    of the first channel as int16."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n_frames = w.getnframes()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n_frames)
    if width != 2:
        raise NotImplementedError(
            f"stdlib WAV decoder handles PCM16 only (got width={width})")
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, n_ch)[:, 0]
    return {"rate": rate, "n_frames": n_frames,
            "duration_ms": int(n_frames * 1000 / rate),
            "samples": samples}


def synthesize_real_media_table(n: int, seed: int = 3) -> pa.Table:
    """Media rows whose payloads are GENUINE encoded formats the stdlib
    lanes can decode: 24-bit BMPs for images, PCM16 WAVs for audio —
    the real-decode counterpart of synthesize_media_table."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "kind", "payload", "width",
                            "height", "duration_ms")}
    for i in range(n):
        if i % 2 == 0:
            w = int(rng.integers(8, 48))
            h = int(rng.integers(8, 48))
            rows["media_id"].append(i)
            rows["kind"].append("image")
            rows["payload"].append(synthesize_bmp(w, h, seed=seed + i))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(0)
        else:
            dur = int(rng.integers(200, 4000))
            rows["media_id"].append(i)
            rows["kind"].append("audio")
            rows["payload"].append(
                synthesize_wav(dur, seed=seed + i))
            rows["width"].append(0)
            rows["height"].append(0)
            rows["duration_ms"].append(dur)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "payload": pa.array(rows["payload"], pa.large_binary()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
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
    """The real decode path: decodes the payload, downsamples to an
    8×8 grayscale thumbnail and returns its 64 pixel intensities as
    float32 features (a perceptual-hash-style embedding). BMP payloads
    decode with the stdlib codec above (REAL decode, no imaging lib);
    every other format needs Pillow in the deployment environment —
    this sandbox has none, so non-BMP decode raises rather than
    falling back silently."""
    if payload[:2] == b"BM":
        decoded = decode_bmp(payload)
        return {"width": decoded["width"], "height": decoded["height"],
                "features": _thumb_features(decoded["pixels"])}
    pil_image = pil_image or _try_import_pil()
    if pil_image is None:
        raise NotImplementedError(
            "non-BMP image decode requires an imaging library (e.g. "
            "Pillow/ffmpeg), not available in this environment — use "
            "the deterministic stub or BMP payloads")
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

    def __init__(self, use_stub: bool = True, codec: str = "auto"):
        self.use_stub = use_stub
        self.codec = codec
        # optional dependency resolved ONCE per actor, not per batch
        self.pil = None if use_stub else _try_import_pil()
        # codec="bmp": payloads are 24-bit BMPs, decoded by the stdlib
        # codec — a REAL decode lane with no imaging-library dependency;
        # codec="auto" must fail LOUDLY at actor construction when the
        # library is missing, never fall back silently to the stub
        if not use_stub and codec == "auto" and self.pil is None:
            raise NotImplementedError(
                "DecodeFeatures(use_stub=False, codec='auto') requires "
                "Pillow in the deployment environment; use codec='bmp' "
                "for the stdlib BMP lane")

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


def decode_features(media_ds, batch_size: int = 32, concurrency: int = 2,
                    use_stub: bool = True, codec: str = "auto"):
    """Wide binary rows → SMALL batch_size so batch × concurrency fits a
    worker heap (guide: memory-aware batching)."""
    return media_ds.map_batches(
        DecodeFeatures,
        fn_constructor_kwargs={"use_stub": use_stub, "codec": codec},
        batch_format="pyarrow", batch_size=batch_size,
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
    """Audio chunking: splits each audio row into fixed-duration chunk
    rows (1→N explode + byte-slicing). Default mode slices the opaque
    payload proportionally by the metadata duration — the layout a
    real resampler would have. ``codec="wav"`` is a REAL lane: the
    stdlib `wave` decode drives chunk boundaries from actual PCM
    frames and each chunk row carries its RMS amplitude."""

    def __init__(self, chunk_ms: int = 5000, codec: str = "opaque"):
        self.chunk_ms = chunk_ms
        self.codec = codec

    def _wav_chunks(self, batch: pa.Table) -> pa.Table:
        ids, idxs, starts, payloads, rms = [], [], [], [], []
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "audio":
                continue
            dec = decode_wav(payload)
            frames_per_chunk = max(1, dec["rate"] * self.chunk_ms
                                   // 1000)
            samples = dec["samples"]
            for i in range(0, len(samples), frames_per_chunk):
                chunk = samples[i:i + frames_per_chunk]
                ids.append(mid)
                idxs.append(i // frames_per_chunk)
                starts.append(int(i * 1000 / dec["rate"]))
                payloads.append(chunk.tobytes())
                rms.append(float(np.sqrt(
                    np.mean(chunk.astype(np.float64) ** 2))))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int32()),
            "start_ms": pa.array(starts, pa.int32()),
            "chunk": pa.array(payloads, pa.large_binary()),
            "rms": pa.array(rms, pa.float64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "wav":
            return self._wav_chunks(batch)
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


def chunk_audio(media_ds, chunk_ms: int = 5000, batch_size: int = 32,
                codec: str = "opaque"):
    return media_ds.map_batches(
        AudioChunker,
        fn_constructor_kwargs={"chunk_ms": chunk_ms, "codec": codec},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency(4), num_cpus=1)
