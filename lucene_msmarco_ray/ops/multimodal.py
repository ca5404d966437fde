"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): each stage raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decode (seeded from the
payload bytes) exercises the real Ray-side plumbing — schema handling, actor
signature, batch sizing, output layout — which is the part that matters for
the engine. Real kernels drop into ``_decode_*`` without touching the
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

    Actor-pool stage: the decoder/model load belongs in ``__init__`` (once
    per actor); per-batch work in ``__call__``. Use with
    ``map_batches(ImageDecodeStage, fn_constructor_kwargs=..., batch_size=32,
    concurrency=N)``.
    """

    def __init__(self, dim: int = 64, resize: tuple[int, int] = (224, 224),
                 fake: bool = False):
        self.dim, self.resize, self.fake = dim, resize, fake
        if not fake:
            # real impl: load PIL/torchvision here, once per actor
            raise NotImplementedError(
                "image decoding requires an image library not present in "
                "this environment; pass fake=True for the deterministic stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [_fake_vector(p, self.dim)
                 for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "width": pa.array([self.resize[0]] * len(feats), pa.int32()),
            "height": pa.array([self.resize[1]] * len(feats), pa.int32()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


class AudioFeatureStage:
    """binary audio → (media_id, n_frames, feature)."""

    def __init__(self, dim: int = 32, frame_ms: int = 25, fake: bool = False):
        self.dim, self.frame_ms, self.fake = dim, frame_ms, fake
        if not fake:
            raise NotImplementedError(
                "audio decoding requires an audio library not present in "
                "this environment; pass fake=True for the deterministic stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        durations = batch["duration_ms"].to_pylist()
        n_frames = [max(1, (d if d and d > 0 else 1000) // self.frame_ms)
                    for d in durations]
        feats = [_fake_vector(p, self.dim) for p in payloads]
        return pa.table({
            "media_id": batch["media_id"],
            "n_frames": pa.array(n_frames, pa.int32()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


class VideoFrameSampleStage:
    """binary video → one row per sampled frame (media_id, frame_idx,
    feature). Frame sampling is deterministic: every ``stride_ms``."""

    def __init__(self, dim: int = 64, stride_ms: int = 1000,
                 max_frames: int = 16, fake: bool = False):
        self.dim, self.stride_ms, self.max_frames = dim, stride_ms, max_frames
        if not fake:
            raise NotImplementedError(
                "video decoding requires a codec library not present in "
                "this environment; pass fake=True for the deterministic stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, feats = [], [], []
        for mid, payload, dur in zip(batch["media_id"].to_pylist(),
                                     batch["payload"].to_pylist(),
                                     batch["duration_ms"].to_pylist()):
            n = min(self.max_frames,
                    max(1, (dur if dur and dur > 0 else 1000) // self.stride_ms))
            for i in range(n):
                ids.append(mid)
                idxs.append(i)
                feats.append(_fake_vector(payload + i.to_bytes(4, "little"),
                                          self.dim).tolist())
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


def decode_media(ds, kind: str, fake: bool = True, batch_size: int = 32,
                 concurrency=(1, 4), **kw):
    """Route a media dataset through the right actor-pool decode stage."""
    stage = {"image": ImageDecodeStage, "audio": AudioFeatureStage,
             "video": VideoFrameSampleStage}[kind]
    filtered = ds.filter(expr=f"kind == '{kind}'")
    return filtered.map_batches(
        stage, fn_constructor_kwargs=dict(fake=fake, **kw),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
