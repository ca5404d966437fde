"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata.

Image, audio AND video decode are REAL, with no external media library:
PNG via stdlib zlib + numpy scanline unfiltering and baseline JPEG via a
pure-numpy DCT/Huffman codec (``ops.jpeg``) — the image stage dispatches
on payload magic; 16-bit PCM WAV via stdlib ``wave``; video via either
the MPNG container (MJPEG-style length-prefixed PNG frames) or real
ISO-BMFF MP4 box/sample-table parsing (``ops.bmff``: stts/stsz/stsc/stco)
with PNG- or motion-JPEG-coded frames. All parses are O(container
index): only the sampled frames' bytes are decoded. ``fake=True`` keeps
the deterministic payload-seeded stub for arbitrary-bytes tests. The one
genuinely library-bound gap left is H.264/HEVC entropy decode inside an
``avc1``/``hev1`` MP4 — the container still parses; the frame decode
raises with a clear error.

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


#: web-scale corpora contain corrupt payloads; a decode stage must choose
#: a policy, not die. "raise" = propagate (tests, trusted data); "skip" =
#: drop the row and log a rate-limited warning (the 100-TB default —
#: losing one bad image beats losing the job).
_ERROR_POLICIES = ("raise", "skip")


def _check_policy(on_error: str) -> None:
    if on_error not in _ERROR_POLICIES:
        raise ValueError(f"on_error must be one of {_ERROR_POLICIES}, "
                         f"got {on_error!r}")


class _SkipCounter:
    """Per-actor rate-limited corrupt-payload logging (first 5, then every
    1000th) — unbounded per-row warnings would melt the log volume."""

    def __init__(self, what: str):
        import logging
        self.log = logging.getLogger(__name__)
        self.what = what
        self.n = 0

    def hit(self, media_id, err: Exception) -> None:
        self.n += 1
        if self.n <= 5 or self.n % 1000 == 0:
            self.log.warning("%s decode failed for media_id=%s (%d skipped "
                             "so far by this actor): %s", self.what,
                             media_id, self.n, err)


class ImageDecodeStage:
    """binary image → (media_id, width, height, feature:list<float32>[dim]).
    Real mode decodes PNG, reports SOURCE dims, and features the
    nearest-neighbor ``resize`` via a mean-pooled luminance grid; fake mode
    reports ``resize`` dims and a payload-seeded vector.

    Actor-pool stage: the decoder/model load belongs in ``__init__`` (once
    per actor); per-batch work in ``__call__``. Use with
    ``map_batches(ImageDecodeStage, fn_constructor_kwargs=..., batch_size=32,
    concurrency=N)``. ``on_error="skip"`` drops undecodable payloads with
    rate-limited logging instead of failing the task.
    """

    def __init__(self, dim: int = 64, resize: tuple[int, int] = (224, 224),
                 fake: bool = False, on_error: str = "raise"):
        _check_policy(on_error)
        self.dim, self.resize, self.fake = dim, resize, fake
        self.on_error = on_error
        self._skips = _SkipCounter("image")
        if not fake:
            # real kernels: PNG (ops.media_codec) / baseline JPEG
            # (ops.jpeg), chosen per payload magic — bind the functions
            # once per actor so __call__ pays no import cost
            from .media_codec import (decode_image, image_feature,
                                      resize_nearest)
            self._decode = decode_image
            self._resize = resize_nearest
            self._feature = image_feature

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch["media_id"].to_pylist()
        if self.fake:
            feats = [_fake_vector(p, self.dim)
                     for p in batch["payload"].to_pylist()]
            widths = [self.resize[0]] * n
            heights = [self.resize[1]] * n
        else:
            ids_out, feats, widths, heights = [], [], [], []
            for mid, p in zip(ids, batch["payload"].to_pylist()):
                try:
                    img = self._decode(p)
                except Exception as e:
                    if self.on_error == "raise":
                        raise
                    self._skips.hit(mid, e)
                    continue
                ids_out.append(mid)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                feats.append(self._feature(self._resize(img, self.resize),
                                           self.dim))
            ids = ids_out
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


class AudioFeatureStage:
    """binary audio → (media_id, n_frames, feature). ``on_error="skip"``
    drops undecodable payloads with rate-limited logging."""

    def __init__(self, dim: int = 32, frame_ms: int = 25, fake: bool = False,
                 on_error: str = "raise"):
        _check_policy(on_error)
        self.dim, self.frame_ms, self.fake = dim, frame_ms, fake
        self.on_error = on_error
        self._skips = _SkipCounter("audio")
        if not fake:
            from .media_codec import audio_feature, decode_wav
            self._decode = decode_wav
            self._feature = audio_feature

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ids = batch["media_id"].to_pylist()
        if self.fake:
            durations = batch["duration_ms"].to_pylist()
            n_frames = [max(1, (d if d and d > 0 else 1000) // self.frame_ms)
                        for d in durations]
            feats = [_fake_vector(p, self.dim) for p in payloads]
        else:
            ids_out, n_frames, feats = [], [], []
            for mid, p in zip(ids, payloads):
                try:
                    samples, rate = self._decode(p)
                except Exception as e:
                    if self.on_error == "raise":
                        raise
                    self._skips.hit(mid, e)
                    continue
                frame_len = max(1, rate * self.frame_ms // 1000)
                ids_out.append(mid)
                n_frames.append(max(1, samples.size // frame_len))
                feats.append(self._feature(samples, self.dim))
            ids = ids_out
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(n_frames, pa.int32()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


class VideoFrameSampleStage:
    """binary video → one row per sampled frame (media_id, frame_idx,
    feature). Real mode parses the container — MPNG (``ops.media_codec``)
    or ISO-BMFF MP4 (``ops.bmff``, real stts/stsz/stsc/stco sample-table
    walk) — samples every ``stride_ms`` of source time, and decodes ONLY
    the sampled frames (PNG- or JPEG-coded; ``avc1``/``hev1`` raise —
    H.264 decode needs a codec library). ``frame_idx`` is the source
    frame index. Fake mode keeps the payload-seeded stub for
    arbitrary-bytes payloads (``frame_idx`` = 0..n-1 over ``duration_ms``).
    ``on_error="skip"`` drops a video whose container parse or sampled
    frame decode fails (whole payload, not frame-by-frame — a corrupt
    container's other offsets are untrustworthy), with rate-limited logs.
    """

    def __init__(self, dim: int = 64, stride_ms: int = 1000,
                 max_frames: int = 16, fake: bool = False,
                 on_error: str = "raise"):
        _check_policy(on_error)
        self.dim, self.stride_ms, self.max_frames = dim, stride_ms, max_frames
        self.fake = fake
        self.on_error = on_error
        self._skips = _SkipCounter("video")
        if not fake:
            from .bmff import parse_mp4
            from .media_codec import decode_image, image_feature, parse_mpng
            self._parse_mpng = parse_mpng
            self._parse_mp4 = parse_mp4
            self._feature = image_feature
            self._decode = decode_image

    def _sampled(self, payload: bytes):
        """container bytes → [(frame_idx, offset, length)] at stride_ms."""
        if payload[4:8] == b"ftyp":
            codec, ts, spans = self._parse_mp4(payload)
            if codec in (b"avc1", b"hev1", b"hvc1"):
                raise NotImplementedError(
                    f"{codec.decode()} frame decode needs a codec library; "
                    "container parse succeeded")
            out, next_ms = [], 0
            for i, (t, span) in enumerate(zip(ts, spans)):
                if t >= next_ms:
                    out.append((i,) + span)
                    next_ms = t + self.stride_ms
            return out[:self.max_frames]
        interval, spans = self._parse_mpng(payload)
        stride = max(1, self.stride_ms // max(1, interval))
        return [(i,) + spans[i]
                for i in list(range(0, len(spans), stride))[:self.max_frames]]

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
            try:
                rows = [(i, self._decode(payload[off:off + ln]))
                        for i, off, ln in self._sampled(payload)]
            except Exception as e:
                if self.on_error == "raise":
                    raise
                self._skips.hit(mid, e)
                continue
            for i, img in rows:
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
    """Deterministic REAL media rows covering every real decode path:
    images alternate PNG (random pixels, per-row filter types cycling 0-4
    so every unfilter path runs) and baseline JPEG (smooth gradients, odd
    image rows, alternating 4:4:4 / 4:2:0); audio is 16-bit PCM WAV
    (sine + noise); videos cycle MPNG, MP4(mpng frames) and
    MP4(motion-JPEG frames) — the MP4s exercise the real ISO-BMFF
    sample-table walk. Same schema as ``synth_media_table``."""
    from .bmff import encode_mp4
    from .jpeg import encode_jpeg
    from .media_codec import encode_mpng, encode_png, encode_wav
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": [], "duration_ms": []}
    img_i = vid_i = 0
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h = int(rng.integers(8, 48))
            w = int(rng.integers(8, 48))
            if img_i % 2 == 0:
                ch = int(rng.choice([1, 2, 3, 4]))
                img = rng.integers(0, 256, (h, w, ch), np.uint8)
                payload = encode_png(img, filters=[y % 5 for y in range(h)])
                mime = "image/png"
            else:
                ch = 1 if img_i % 4 == 1 else 3
                base = rng.integers(0, 128, (1, 1, ch))
                yy, xx = np.mgrid[0:h, 0:w]
                img = ((base + yy[:, :, None] + 2 * xx[:, :, None]) % 256
                       ).astype(np.uint8)
                payload = encode_jpeg(img, quality=90,
                                      subsample=(ch == 3 and img_i % 4 == 3))
                mime = "image/jpeg"
            img_i += 1
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
            mime = "audio/wav"
        else:
            nf = int(rng.integers(3, 11))
            h = int(rng.integers(8, 24))
            w = int(rng.integers(8, 24))
            interval = 40
            frames = [rng.integers(0, 256, (h, w, 3), np.uint8)
                      for _ in range(nf)]
            style = vid_i % 3
            if style == 0:
                payload = encode_mpng(frames, frame_interval_ms=interval,
                                      filters=[y % 5 for y in range(h)])
            elif style == 1:
                payload = encode_mp4([encode_png(f) for f in frames],
                                     interval, w, h, codec=b"mpng")
            else:
                payload = encode_mp4([encode_jpeg(f, 90) for f in frames],
                                     interval, w, h, codec=b"jpeg")
            vid_i += 1
            width, height = w, h
            dur = nf * interval
            mime = "video/mp4"
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
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
