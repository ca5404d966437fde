"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata.

Image, audio AND video decode are REAL: PNG via stdlib zlib + numpy
scanline unfiltering, 16-bit PCM WAV via stdlib ``wave``, and video via
the MPNG container (MJPEG-style length-prefixed PNG frames; parse is
O(index), only sampled frames are inflated) — all in ``ops.media_codec``,
no external media library needed. ``fake=True`` keeps the deterministic
payload-seeded stub for arbitrary-bytes tests. Standard containers
(JPEG/MP4/H.264) genuinely need libraries absent from this environment;
their kernels would drop into the same ``__call__`` without touching the
pipeline shape.

Design notes for 100 TB: binary payloads make rows wide — callers should
cap ``batch_size`` (default 32 here vs thousands for text) and keep
``batch_format="pyarrow"`` so payloads stay zero-copy in the object store;
decoded features are small fixed-width vectors, so the expensive stage
shrinks data volume and everything downstream is cheap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown / n.a.
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_vector(payload: bytes, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class ImageDecodeStage:
    """binary image → (media_id, width, height, feature:list<float32>[dim]).
    Real mode decodes PNG, reports SOURCE dims, and features the
    nearest-neighbor ``resize`` via a mean-pooled luminance grid; fake mode
    reports ``resize`` dims and a payload-seeded vector.

    Actor-pool stage: the decoder/model load belongs in ``__init__`` (once
    per actor); per-batch work in ``__call__``. Use with
    ``map_batches(ImageDecodeStage, fn_constructor_kwargs=..., batch_size=32,
    concurrency=N)``.
    """

    def __init__(self, dim: int = 64, resize: tuple[int, int] = (224, 224),
                 fake: bool = False):
        self.dim, self.resize, self.fake = dim, resize, fake
        if not fake:
            # real kernel: stdlib PNG decode (ops.media_codec) — bind the
            # functions once per actor so __call__ pays no import cost
            from .media_codec import decode_png, image_feature, resize_nearest
            self._decode = decode_png
            self._resize = resize_nearest
            self._feature = image_feature

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.fake:
            feats = [_fake_vector(p, self.dim)
                     for p in batch["payload"].to_pylist()]
            widths = [self.resize[0]] * n
            heights = [self.resize[1]] * n
        else:
            feats, widths, heights = [], [], []
            for p in batch["payload"].to_pylist():
                img = self._decode(p)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                feats.append(self._feature(self._resize(img, self.resize),
                                           self.dim))
        return pa.table({
            "media_id": batch["media_id"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


class AudioFeatureStage:
    """binary audio → (media_id, n_frames, feature)."""

    def __init__(self, dim: int = 32, frame_ms: int = 25, fake: bool = False):
        self.dim, self.frame_ms, self.fake = dim, frame_ms, fake
        if not fake:
            from .media_codec import audio_feature, decode_wav
            self._decode = decode_wav
            self._feature = audio_feature

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.fake:
            durations = batch["duration_ms"].to_pylist()
            n_frames = [max(1, (d if d and d > 0 else 1000) // self.frame_ms)
                        for d in durations]
            feats = [_fake_vector(p, self.dim) for p in payloads]
        else:
            n_frames, feats = [], []
            for p in payloads:
                samples, rate = self._decode(p)
                frame_len = max(1, rate * self.frame_ms // 1000)
                n_frames.append(max(1, samples.size // frame_len))
                feats.append(self._feature(samples, self.dim))
        return pa.table({
            "media_id": batch["media_id"],
            "n_frames": pa.array(n_frames, pa.int32()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


class VideoFrameSampleStage:
    """binary video → one row per sampled frame (media_id, frame_idx,
    feature). Real mode parses the MPNG container (``ops.media_codec``:
    MJPEG-style length-prefixed PNG frames), samples every ``stride_ms``
    of source time, and decodes ONLY the sampled frames — ``frame_idx`` is
    the source frame index. Fake mode keeps the payload-seeded stub for
    arbitrary-bytes payloads (``frame_idx`` = 0..n-1 over ``duration_ms``).
    """

    def __init__(self, dim: int = 64, stride_ms: int = 1000,
                 max_frames: int = 16, fake: bool = False):
        self.dim, self.stride_ms, self.max_frames = dim, stride_ms, max_frames
        self.fake = fake
        if not fake:
            from .media_codec import decode_png, image_feature, parse_mpng
            self._parse = parse_mpng
            self._decode = decode_png
            self._feature = image_feature

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, feats = [], [], []
        for mid, payload, dur in zip(batch["media_id"].to_pylist(),
                                     batch["payload"].to_pylist(),
                                     batch["duration_ms"].to_pylist()):
            if self.fake:
                n = min(self.max_frames,
                        max(1, (dur if dur and dur > 0 else 1000)
                            // self.stride_ms))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    feats.append(
                        _fake_vector(payload + i.to_bytes(4, "little"),
                                     self.dim).tolist())
                continue
            interval, spans = self._parse(payload)
            stride = max(1, self.stride_ms // max(1, interval))
            for i in list(range(0, len(spans), stride))[:self.max_frames]:
                off, ln = spans[i]
                img = self._decode(payload[off:off + ln])
                ids.append(mid)
                idxs.append(i)
                feats.append(self._feature(img, self.dim).tolist())
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(idxs, pa.int32()),
                         "feature": pa.array(feats, pa.list_(pa.float32()))})


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media rows for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": [], "duration_ms": []}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.integers(0, 512)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(64, 1920)) if kind == "image" else -1)
        rows["height"].append(int(rng.integers(64, 1080)) if kind == "image" else -1)
        rows["duration_ms"].append(int(rng.integers(500, 20_000))
                                   if kind != "image" else -1)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def synth_real_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic REAL media rows: PNG payloads (random pixels, per-row
    filter types cycling 0-4 so every unfilter path runs) and 16-bit PCM
    WAV payloads (sine + noise), and MPNG video payloads (random PNG
    frames at 40 ms intervals). Same schema as ``synth_media_table``."""
    from .media_codec import encode_png, encode_wav
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": [], "duration_ms": []}
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h = int(rng.integers(8, 48))
            w = int(rng.integers(8, 48))
            ch = int(rng.choice([1, 2, 3, 4]))
            img = rng.integers(0, 256, (h, w, ch), np.uint8)
            payload = encode_png(img, filters=[y % 5 for y in range(h)])
            width, height, dur = w, h, -1
        elif kind == "audio":
            rate = 8000
            dur = int(rng.integers(100, 1200))
            t = np.arange(rate * dur // 1000) / rate
            freq = float(rng.uniform(100, 900))
            sig = 0.6 * np.sin(2 * np.pi * freq * t) \
                + 0.1 * rng.standard_normal(t.size)
            payload = encode_wav(sig, rate)
            width = height = -1
        else:
            from .media_codec import encode_mpng
            nf = int(rng.integers(3, 11))
            h = int(rng.integers(8, 24))
            w = int(rng.integers(8, 24))
            interval = 40
            frames = [rng.integers(0, 256, (h, w, 3), np.uint8)
                      for _ in range(nf)]
            payload = encode_mpng(frames, frame_interval_ms=interval,
                                  filters=[y % 5 for y in range(h)])
            width, height = w, h
            dur = nf * interval
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(dur)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def decode_media(ds, kind: str, fake: bool = True, batch_size: int = 32,
                 concurrency=(1, 4), **kw):
    """Route a media dataset through the right actor-pool decode stage."""
    stage = {"image": ImageDecodeStage, "audio": AudioFeatureStage,
             "video": VideoFrameSampleStage}[kind]
    filtered = ds.filter(expr=f"kind == '{kind}'")
    return filtered.map_batches(
        stage, fn_constructor_kwargs=dict(fake=fake, **kw),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
