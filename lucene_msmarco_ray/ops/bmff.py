"""ISO base media file format (MP4) container — real box-level parse and
a minimal spec-shaped writer, no external media library.

``parse_mp4`` walks the real box tree (ftyp/moov/trak/mdia/minf/stbl) and
reconstructs the per-sample layout from the standard sample tables:
``stts`` (decode deltas), ``stsz`` (sizes), ``stsc`` (sample→chunk runs)
and ``stco``/``co64`` (chunk offsets) — the general mapping, not just the
single-chunk case — so frame sampling is O(container index) and only the
sampled frames' bytes are ever touched. This works on ANY ISO-BMFF file;
whether the sample BYTES can be decoded depends on the codec fourcc:
``mpng`` (this module's writer: PNG-coded frames, decodable with the
in-repo PNG kernel) and ``jpeg`` (ISO/IEC 14496-15-style motion-JPEG
visual entries, decodable with the in-repo JPEG kernel) are real decode
paths; ``avc1``/``hev1`` parse fine but frame decode raises — an H.264
entropy decoder genuinely needs a codec library absent here.

``encode_mp4`` writes ftyp + mdat + moov with a single video track so
tests and gates synthesize REAL container payloads deterministically.
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------------ write


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4(frames: list[bytes], frame_interval_ms: int = 40,
               width: int = 0, height: int = 0,
               codec: bytes = b"mpng") -> bytes:
    """frame payload bytes → single-video-track MP4 (timescale 1000).

    ``codec`` is the stsd sample-entry fourcc; the writer is payload-
    agnostic (callers pass PNG bytes for ``mpng``, JFIF bytes for
    ``jpeg``). mdat precedes moov so stco offsets are exact.
    """
    n = len(frames)
    interval = int(frame_interval_ms)
    dur = n * interval
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommpng")
    mdat = _box(b"mdat", b"".join(frames))
    first_off = len(ftyp) + 8                      # mdat header is 8 bytes

    # stbl sample tables
    stsd_entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1)
                      + b"\x00" * 16
                      + struct.pack(">HH", width, height)
                      + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
                      + b"\x00" * 4 + struct.pack(">H", 1)
                      + b"\x00" * 32
                      + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, interval))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url_ = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, dur)
                 + struct.pack(">HH", 0x55C4, 0))        # 'und' language
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, dur)
                 + b"\x00" * 16
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, dur)
                 + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------------------------ parse


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for sibling boxes in a span."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                              # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:                            # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed ISO-BMFF box")
        yield btype, body, pos + size
        pos += size


def _collect(data: bytes, start: int, end: int, found: dict) -> None:
    """Collect sample-table boxes within ONE trak (or mdia/minf/stbl)
    subtree — never called across trak boundaries, so tables from
    different tracks can't mix."""
    for btype, body, bend in _boxes(data, start, end):
        if btype in (b"mdia", b"minf", b"stbl"):
            _collect(data, body, bend, found)
        elif btype in (b"stts", b"stsz", b"stsc", b"stco", b"co64",
                       b"stsd", b"mdhd", b"hdlr"):
            found.setdefault(btype, (body, bend))


def _pick_track(payload: bytes) -> dict:
    """moov → the FIRST trak whose hdlr handler type is 'vide' (falling
    back to the first trak at all if none is marked video — e.g. this
    module's own minimal writer omits tkhd-level typing in tests built by
    hand). Audio-first muxer output therefore still resolves the video
    track, and boxes are never combined across traks."""
    traks: list[dict] = []
    for btype, body, bend in _boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for t, tb, te in _boxes(payload, body, bend):
            if t != b"trak":
                continue
            found: dict[bytes, tuple[int, int]] = {}
            _collect(payload, tb, te, found)
            traks.append(found)
    for found in traks:
        h = found.get(b"hdlr")
        if h and payload[h[0] + 8:h[0] + 12] == b"vide":
            return found
    return traks[0] if traks else {}


def parse_mp4(payload: bytes):
    """→ (codec_fourcc: bytes, sample_ts_ms: list[int],
    spans: list[(offset, length)]) without touching any sample bytes.

    Timestamps are cumulative stts deltas rescaled to ms via the mdhd
    timescale; offsets come from the full stsc chunk-run × stco mapping.
    Track selection: the first 'vide'-handler trak (see
    :func:`_pick_track`). All table COUNTS are validated against their
    box's byte length before any loop or allocation — a corrupt 32-bit
    count must raise, not hang or OOM the decode task (the same
    bounded-work discipline as the JPEG decoder's entropy-length guard).
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    found = _pick_track(payload)
    for req in (b"stts", b"stsz", b"stsc", b"stsd", b"mdhd"):
        if req not in found:
            raise ValueError(f"MP4 missing {req.decode()} box")
    if b"stco" not in found and b"co64" not in found:
        raise ValueError("MP4 missing chunk-offset box")

    def body(btype: bytes) -> bytes:
        s, e = found[btype]
        return payload[s:e]

    def checked(n: int, avail_bytes: int, per: int, what: str) -> int:
        if n < 0 or n * per > avail_bytes:
            raise ValueError(
                f"MP4 {what} count {n} exceeds its box size")
        return n

    # mdhd → timescale (version 0: u32s; version 1: u64 times)
    mb = body(b"mdhd")
    version = mb[0]
    timescale = struct.unpack_from(">I", mb, 20 if version == 1 else 12)[0]
    if timescale <= 0:
        raise ValueError("MP4 timescale must be positive")

    # stsd → first sample-entry fourcc
    sb = body(b"stsd")
    codec = sb[12:16]

    # stts → per-sample decode times
    tb = body(b"stts")
    (n_ent,) = struct.unpack_from(">I", tb, 4)
    n_ent = checked(n_ent, len(tb) - 8, 8, "stts entry")
    # total sample count is ALSO untrusted (one entry can claim 2^32
    # samples); bound it by what stsz declares below before expanding
    entries = [struct.unpack_from(">II", tb, 8 + 8 * i)
               for i in range(n_ent)]

    # stsz → sizes
    zb = body(b"stsz")
    fixed, n_samples = struct.unpack_from(">II", zb, 4)
    if fixed:
        n_samples = checked(n_samples, len(payload), 1, "stsz sample")
        sizes = [fixed] * n_samples
    else:
        n_samples = checked(n_samples, len(zb) - 12, 4, "stsz sample")
        sizes = list(struct.unpack_from(f">{n_samples}I", zb, 12))

    ts, t = [], 0
    for cnt, delta in entries:
        for _ in range(min(cnt, n_samples - len(ts))):
            ts.append(t * 1000 // timescale)
            t += delta
        if len(ts) >= n_samples:
            break
    # cross-check: each table was size-validated on its own, but stts
    # expanding to FEWER timestamps than stsz declares samples would
    # otherwise silently drop the trailing frames in downstream zips —
    # fail loud like the stsc/stco consistency checks
    if len(ts) < n_samples:
        raise ValueError(
            f"sample tables inconsistent: stts covers {len(ts)} samples, "
            f"stsz declares {n_samples}")

    # stco/co64 → chunk offsets
    if b"stco" in found:
        cb = body(b"stco")
        (n_chunks,) = struct.unpack_from(">I", cb, 4)
        n_chunks = checked(n_chunks, len(cb) - 8, 4, "stco chunk")
        chunk_off = list(struct.unpack_from(f">{n_chunks}I", cb, 8))
    else:
        cb = body(b"co64")
        (n_chunks,) = struct.unpack_from(">I", cb, 4)
        n_chunks = checked(n_chunks, len(cb) - 8, 8, "co64 chunk")
        chunk_off = list(struct.unpack_from(f">{n_chunks}Q", cb, 8))

    # stsc chunk runs → samples-per-chunk for every chunk
    cb = body(b"stsc")
    (n_runs,) = struct.unpack_from(">I", cb, 4)
    n_runs = checked(n_runs, len(cb) - 8, 12, "stsc run")
    runs = [struct.unpack_from(">III", cb, 8 + 12 * i)[:2]
            for i in range(n_runs)]
    spc: list[int] = []
    for i, (first, per) in enumerate(runs):
        last = runs[i + 1][0] if i + 1 < len(runs) else n_chunks + 1
        span = min(max(last - first, 0), n_chunks - len(spc))
        spc.extend([per] * span)
    spc = spc[:n_chunks]

    # walk chunks → absolute sample spans
    spans, si = [], 0
    for ci, coff in enumerate(chunk_off):
        off = coff
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= n_samples:
                break
            spans.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("MP4 sample tables inconsistent")
    return codec, ts[:n_samples], spans
