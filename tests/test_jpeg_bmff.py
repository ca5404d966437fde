"""Unit tests for the pure-numpy baseline JPEG codec (ops/jpeg.py) and the
ISO-BMFF MP4 container writer/parser (ops/bmff.py) — no Ray needed."""

import numpy as np
import pytest

from lucene_msmarco_ray.ops.bmff import encode_mp4, parse_mp4
from lucene_msmarco_ray.ops.jpeg import (
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)
from lucene_msmarco_ray.ops.media_codec import decode_png, encode_png


def _err(a, b):
    return np.abs(a.astype(np.int64) - b.astype(np.int64))


def test_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # first diagonal of the standard scan: 0, 1, 8, 16, 9, 2
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert (ZIGZAG[UNZIGZAG] == np.arange(64)).all()


def test_jpeg_constant_image_is_exact():
    for val in (0, 67, 128, 255):
        img = np.full((24, 16, 3), val, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (24, 16, 3)
        assert _err(out, img).max() <= 1  # single rounding step


def test_jpeg_gradient_roundtrip_bounded_error():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256,
                    ((yy + xx) * 2) % 256], axis=2).astype(np.uint8)
    out95 = decode_jpeg(encode_jpeg(img, quality=95))
    assert _err(out95, img).mean() < 1.0 and _err(out95, img).max() <= 4
    out50 = decode_jpeg(encode_jpeg(img, quality=50))
    assert _err(out50, img).mean() < 4.0
    # higher quality must not be worse
    assert _err(out95, img).mean() <= _err(out50, img).mean()


def test_jpeg_grayscale_and_nonmultiple_of_8_dims():
    yy, xx = np.mgrid[0:13, 0:21]        # forces edge padding
    g = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (13, 21, 1)
    assert _err(out[:, :, 0], g).max() <= 3


def test_jpeg_420_subsampling_roundtrip():
    yy, xx = np.mgrid[0:33, 0:47]        # non-multiple of 16 → MCU padding
    img = np.stack([(yy * 4) % 256, (xx * 3) % 256,
                    (yy + xx) % 256], axis=2).astype(np.uint8)
    p = encode_jpeg(img, quality=90, subsample=True)
    out = decode_jpeg(p)
    assert out.shape == img.shape
    # chroma is 2x2 pooled + replicated: luma-dominated error stays small
    assert _err(out, img).mean() < 4.0
    # 4:2:0 stream must be smaller than 4:4:4 on the same image
    assert len(p) < len(encode_jpeg(img, quality=90, subsample=False))


def test_jpeg_noise_stress_hits_byte_stuffing():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    p = encode_jpeg(img, quality=95)
    # noise at q95 produces 0xFF entropy bytes → stuffed 0xFF00 pairs
    assert b"\xff\x00" in p
    out = decode_jpeg(p)
    assert _err(out, img).mean() < 8.0


def test_jpeg_determinism_and_magic():
    img = np.arange(24 * 24 * 3, dtype=np.uint8).reshape(24, 24, 3)
    p1, p2 = encode_jpeg(img, 85), encode_jpeg(img, 85)
    assert p1 == p2 and p1[:2] == b"\xff\xd8" and p1[-2:] == b"\xff\xd9"
    assert np.array_equal(decode_jpeg(p1), decode_jpeg(p2))


def test_jpeg_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")
    img = np.full((8, 8), 100, np.uint8)
    p = bytearray(encode_jpeg(img))
    sof = p.find(b"\xff\xc0")
    p[sof + 1] = 0xC2                     # rewrite SOF0 → SOF2 progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(p))


def test_mp4_roundtrip_png_frames_bit_exact():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (12, 20, 3), np.uint8) for _ in range(9)]
    mp4 = encode_mp4([encode_png(f) for f in frames], 40, 20, 12,
                     codec=b"mpng")
    codec, ts, spans = parse_mp4(mp4)
    assert codec == b"mpng"
    assert ts == [40 * i for i in range(9)]
    assert len(spans) == 9
    for f, (off, ln) in zip(frames, spans):
        assert np.array_equal(decode_png(mp4[off:off + ln]), f)


def test_mp4_jpeg_frames_and_timescale_rescale():
    yy, xx = np.mgrid[0:16, 0:16]
    frames = [((yy + xx + 9 * i) % 256).astype(np.uint8) for i in range(4)]
    mp4 = encode_mp4([encode_jpeg(f, 95) for f in frames], 100, 16, 16,
                     codec=b"jpeg")
    codec, ts, spans = parse_mp4(mp4)
    assert codec == b"jpeg" and ts == [0, 100, 200, 300]
    for f, (off, ln) in zip(frames, spans):
        out = decode_jpeg(mp4[off:off + ln])
        assert _err(out[:, :, 0], f).max() <= 3


def test_mp4_parser_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 64)
    mp4 = encode_mp4([b"x" * 10, b"y" * 12], 40)
    with pytest.raises(ValueError):
        parse_mp4(mp4[: len(mp4) // 2])   # moov truncated away


def test_mp4_multi_chunk_stsc_mapping():
    """Hand-build stco/stsc with TWO chunk runs (2+2 then 1 sample) to
    prove the general sample→chunk walk, not just the single-chunk case."""
    import struct

    samples = [bytes([65 + i]) * (i + 3) for i in range(5)]
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    mdat_body = b"".join(samples)
    mdat = struct.pack(">I", 8 + len(mdat_body)) + b"mdat" + mdat_body
    base = len(ftyp) + 8
    # chunks: [s0 s1] [s2 s3] [s4]
    offs = [base, base + 7, base + 18]

    def full(t, payload):
        return struct.pack(">I", len(payload) + 12) + t + b"\x00" * 4 \
            + payload

    def box(t, payload):
        return struct.pack(">I", len(payload) + 8) + t + payload

    stsd = full(b"stsd", struct.pack(">I", 1)
                + box(b"mpng", b"\x00" * 78))
    stts = full(b"stts", struct.pack(">III", 1, 5, 50))
    stsc = full(b"stsc", struct.pack(">I", 2)
                + struct.pack(">III", 1, 2, 1)
                + struct.pack(">III", 3, 1, 1))
    stsz = full(b"stsz", struct.pack(">II", 0, 5)
                + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = full(b"stco", struct.pack(">I", 3)
                + b"".join(struct.pack(">I", o) for o in offs))
    mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 100, 250)
                + struct.pack(">HH", 0x55C4, 0))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    moov = box(b"moov", box(b"trak", box(b"mdia", mdhd + box(b"minf",
                                                             stbl))))
    mp4 = ftyp + mdat + moov
    codec, ts, spans = parse_mp4(mp4)
    assert codec == b"mpng"
    assert ts == [0, 500, 1000, 1500, 2000]   # timescale 100, delta 50
    for s, (off, ln) in zip(samples, spans):
        assert mp4[off:off + ln] == s


def test_video_stage_mp4_and_mpng_paths_agree(ray_session):
    """The SAME frames through MPNG and MP4(mpng) containers must yield
    identical sampled features; avc1 raises NotImplementedError."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_msmarco_ray.ops.media_codec import encode_mpng
    from lucene_msmarco_ray.ops.multimodal import (
        MEDIA_SCHEMA,
        VideoFrameSampleStage,
        decode_media,
    )
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (10, 14, 3), np.uint8) for _ in range(8)]
    pngs = [encode_png(f) for f in frames]
    payloads = [encode_mpng(frames, frame_interval_ms=40),
                encode_mp4(pngs, 40, 14, 10, codec=b"mpng")]
    tbl = pa.Table.from_pydict({
        "media_id": [0, 1], "kind": ["video"] * 2, "payload": payloads,
        "mime": ["video/mp4"] * 2, "width": [14] * 2, "height": [10] * 2,
        "duration_ms": [320] * 2}, schema=MEDIA_SCHEMA)
    out = decode_media(rd.from_arrow(tbl), "video", fake=False,
                       stride_ms=80, concurrency=1).to_pandas()
    a = out[out["media_id"] == 0].sort_values("frame_idx")
    b = out[out["media_id"] == 1].sort_values("frame_idx")
    assert a["frame_idx"].tolist() == b["frame_idx"].tolist() == [0, 2, 4, 6]
    assert np.array_equal(np.array(a["feature"].tolist()),
                          np.array(b["feature"].tolist()))

    stage = VideoFrameSampleStage(fake=False)
    avc = encode_mp4([b"\x00\x00\x01fake-nal"], 40, 0, 0, codec=b"avc1")
    with pytest.raises(NotImplementedError, match="avc1"):
        stage._sampled(avc)


def test_real_media_table_mixes_formats():
    from lucene_msmarco_ray.ops.multimodal import synth_real_media_table
    tbl = synth_real_media_table(30)
    mimes = {k: set() for k in ("image", "audio", "video")}
    magics = []
    for k, p, m in zip(tbl["kind"].to_pylist(), tbl["payload"].to_pylist(),
                       tbl["mime"].to_pylist()):
        mimes[k].add(m)
        if k == "image":
            magics.append("jpeg" if p[:2] == b"\xff\xd8" else "png")
        if k == "video" and p[4:8] == b"ftyp":
            magics.append("mp4")
    assert "jpeg" in magics and "png" in magics and "mp4" in magics
    assert mimes["image"] == {"image/png", "image/jpeg"}


def test_decode_stages_skip_policy(ray_session):
    """A corrupt payload mixed into every modality: on_error='skip' drops
    exactly the bad rows and keeps the good ones; the default ('raise')
    propagates; a bad policy string rejects at construction."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_msmarco_ray.ops.media_codec import encode_mpng, encode_wav
    from lucene_msmarco_ray.ops.multimodal import (
        MEDIA_SCHEMA,
        ImageDecodeStage,
        decode_media,
        synth_real_media_table,
    )
    good = synth_real_media_table(9)
    junk = b"\xff\xd8 this is not a real jpeg at all"
    bad_rows = pa.Table.from_pydict({
        "media_id": [100, 101, 102],
        "kind": ["image", "audio", "video"],
        "payload": [junk, b"RIFFgarbage", b"\x00\x00\x00\x10ftypgarbage"],
        "mime": ["image/jpeg", "audio/wav", "video/mp4"],
        "width": [8, -1, 8], "height": [8, -1, 8],
        "duration_ms": [-1, 100, 100]}, schema=MEDIA_SCHEMA)
    tbl = pa.concat_tables([good, bad_rows])
    ds = rd.from_arrow(tbl)
    n_good = {"image": 3, "audio": 3, "video": 3}
    for kind in ("image", "audio", "video"):
        out = decode_media(ds, kind, fake=False, concurrency=1,
                           on_error="skip").to_pandas()
        assert 100 + ["image", "audio", "video"].index(kind) \
            not in set(out["media_id"])
        assert len(set(out["media_id"])) == n_good[kind]
        with pytest.raises(Exception):
            decode_media(ds, kind, fake=False, concurrency=1).to_pandas()
    with pytest.raises(ValueError, match="on_error"):
        ImageDecodeStage(on_error="ignore")


def test_jpeg_decoder_survives_mutated_payloads():
    """200 seeded single-byte mutations of a valid JPEG: decode must either
    return an image or raise a clean exception (never hang or crash) —
    the property the on_error='skip' stage policy relies on."""
    yy, xx = np.mgrid[0:24, 0:24]
    img = np.stack([(yy * 5) % 256, (xx * 7) % 256, (yy + xx) % 256],
                   axis=2).astype(np.uint8)
    p = bytearray(encode_jpeg(img, quality=80))
    rng = np.random.default_rng(99)
    ok = bad = 0
    for _ in range(200):
        q = bytearray(p)
        pos = int(rng.integers(2, len(q)))       # keep the SOI magic
        q[pos] = int(rng.integers(0, 256))
        try:
            out = decode_jpeg(bytes(q))
            assert out.dtype == np.uint8 and out.ndim == 3
            ok += 1
        except Exception:
            bad += 1
    assert ok + bad == 200
    # header mutations must actually be rejected sometimes (sanity that
    # the loop exercises both outcomes)
    assert bad > 0


def test_mp4_parser_survives_mutated_payloads():
    frames = [b"a" * 9, b"bb" * 6, b"c" * 5]
    p = bytearray(encode_mp4(frames, 40, 4, 4))
    rng = np.random.default_rng(5)
    for _ in range(200):
        q = bytearray(p)
        pos = int(rng.integers(8, len(q)))
        q[pos] = int(rng.integers(0, 256))
        try:
            codec, ts, spans = parse_mp4(bytes(q))
            assert len(ts) == len(spans)
        except Exception:
            pass


def test_png_mpng_wav_parsers_survive_mutations():
    """Same mutation fuzz for the other pure parsers: decode or raise
    cleanly, bounded time."""
    from lucene_msmarco_ray.ops.media_codec import (
        decode_wav,
        encode_mpng,
        encode_wav,
        parse_mpng,
    )
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    png = bytearray(encode_png(img, filters=[y % 5 for y in range(16)]))
    mpng = bytearray(encode_mpng([img, img], frame_interval_ms=40))
    wav = bytearray(encode_wav(np.sin(np.arange(800) / 20.0), 8000))
    for payload, fn, lo in ((png, decode_png, 8), (mpng, parse_mpng, 4),
                            (wav, decode_wav, 4)):
        for _ in range(150):
            q = bytearray(payload)
            pos = int(rng.integers(lo, len(q)))
            q[pos] = int(rng.integers(0, 256))
            try:
                fn(bytes(q))
            except Exception:
                pass


def _extract_box(data: bytes, btype: bytes, start: int = 0,
                 end: int | None = None) -> bytes:
    import struct
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        t = data[pos + 4:pos + 8]
        if t == btype:
            return data[pos:pos + size]
        pos += size
    raise KeyError(btype)


def test_mp4_audio_first_track_order():
    """Muxers often list the audio trak first: parse_mp4 must select the
    'vide'-handler trak, not blindly the first one, and never mix tables
    across traks."""
    frames = [b"F" * 10, b"G" * 12, b"H" * 9]
    video = encode_mp4(frames, 40, 4, 4, codec=b"mpng")
    # a decoy "audio" file with DIFFERENT timing/codec, trak extracted
    decoy = encode_mp4([b"a" * 5, b"b" * 6], 999, 0, 0, codec=b"mp4a")
    moov_v = _extract_box(video, b"moov")
    moov_d = _extract_box(decoy, b"moov")
    trak_v = _extract_box(moov_v, b"trak", 8)
    trak_d = _extract_box(moov_d, b"trak", 8).replace(b"vide", b"soun")
    mvhd = _extract_box(moov_v, b"mvhd", 8)
    import struct
    body = mvhd + trak_d + trak_v                # audio trak FIRST
    moov = struct.pack(">I", len(body) + 8) + b"moov" + body
    head = video[:video.index(b"moov", 4) - 4]   # ftyp + mdat unchanged
    mixed = head + moov
    codec, ts, spans = parse_mp4(mixed)
    assert codec == b"mpng"                      # the video trak won
    assert ts == [0, 40, 80]
    for f, (off, ln) in zip(frames, spans):
        assert mixed[off:off + ln] == f


def test_mp4_corrupt_counts_raise_quickly():
    """Untrusted 32-bit counts (stts entries, stsz samples, stco chunks)
    must raise, not hang/OOM — validated against each box's byte size."""
    import struct
    import time

    base = encode_mp4([b"x" * 7, b"y" * 8], 40)
    for marker, count_off in ((b"stts", 4), (b"stsz", 8), (b"stco", 4)):
        pos = base.index(marker)
        bad = bytearray(base)
        struct.pack_into(">I", bad, pos + 4 + count_off, 0x40000000)
        t0 = time.time()
        with pytest.raises(ValueError):
            parse_mp4(bytes(bad))
        assert time.time() - t0 < 1.0, marker
