"""Pure-stdlib ISO BMFF (MP4) container parsing + fixture writer.

`parse_mp4_samples` walks the box tree (ftyp/moov/trak/mdia/minf/stbl),
reads the video track's sample tables — stts (decode deltas), stsc
(sample->chunk), stsz (sizes), stco/co64 (chunk offsets), mdhd
(timescale) — and returns every sample's absolute byte range and
decode timestamp.  That is the real work a frame-sampling pipeline does
at the container level; only the codec bitstream inside each sample
(H.264 etc.) stays undecoded in this sandbox (production: ffmpeg).

`make_mp4` writes a minimal but structurally valid MP4 (ftyp + mdat +
moov with full sample tables, multi-chunk, self-contained dref) that
any demuxer can open.

Reference parity note: the reference pipeline has no video path; this
backs the multimodal `sample_frames` stage the 100 TB training-data
mandate adds on top.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class Mp4Sample(NamedTuple):
    offset: int
    size: int
    ts_ms: int


class Mp4Track(NamedTuple):
    timescale: int
    duration_ms: int
    samples: list[Mp4Sample]


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _walk(buf: bytes, start: int, end: int, out: dict[bytes, list[tuple[int, int]]],
          depth: int = 0) -> None:
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("bad box size")
        out.setdefault(btype, []).append((pos + hdr, pos + size))
        if btype in _CONTAINERS and depth < 8:
            _walk(buf, pos + hdr, pos + size, out, depth + 1)
        pos += size


def _fullbox(buf: bytes, start: int) -> tuple[int, int]:
    """-> (version, payload offset past version/flags)."""
    return buf[start], start + 4


def parse_mp4_samples(payload: bytes) -> Mp4Track | None:
    """MP4 bytes -> video track sample ranges + timestamps; None when the
    payload is not a parseable MP4 (or has no usable sample tables)."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    try:
        return _parse(payload)
    except (ValueError, IndexError, struct.error, ZeroDivisionError):
        return None


def _parse(buf: bytes) -> Mp4Track | None:
    top: dict[bytes, list[tuple[int, int]]] = {}
    _walk(buf, 0, len(buf), top)
    if b"trak" not in top:
        return None
    # pick the video track ('vide' hdlr), else the first with an stbl
    chosen = None
    for tstart, tend in top[b"trak"]:
        sub: dict[bytes, list[tuple[int, int]]] = {}
        _walk(buf, tstart, tend, sub, depth=1)
        if b"stbl" not in sub or b"mdhd" not in sub:
            continue
        is_video = False
        for hstart, hend in sub.get(b"hdlr", []):
            if buf[hstart + 8 : hstart + 12] == b"vide":
                is_video = True
        if chosen is None or is_video:
            chosen = sub
            if is_video:
                break
    if chosen is None:
        return None

    mstart, _ = chosen[b"mdhd"][0]
    ver, p = _fullbox(buf, mstart)
    if ver == 1:
        timescale, duration = struct.unpack_from(">IQ", buf, p + 16)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", buf, p)
    if timescale <= 0:
        return None

    def table(name: bytes) -> tuple[int, int] | None:
        boxes = chosen.get(name)
        return boxes[0] if boxes else None

    # stsz: sample sizes
    loc = table(b"stsz")
    if loc is None:
        return None
    _, p = _fullbox(buf, loc[0])
    uniform, count = struct.unpack_from(">II", buf, p)
    # Sanity-bound the 32-bit count BEFORE materializing per-sample
    # lists: every sample occupies >=1 byte of the file (and the
    # non-uniform table itself needs 4 bytes/entry), so a count beyond
    # len(buf) is corrupt — raising here keeps a crafted
    # count=0xFFFFFFFF from forcing a multi-GB allocation instead of
    # the contractual None.
    if count > len(buf):
        raise ValueError("stsz count overflow")
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", buf, p + 8))

    # stco / co64: chunk offsets
    loc = table(b"stco")
    if loc is not None:
        _, p = _fullbox(buf, loc[0])
        (nchunk,) = struct.unpack_from(">I", buf, p)
        chunk_offsets = list(struct.unpack_from(f">{nchunk}I", buf, p + 4))
    else:
        loc = table(b"co64")
        if loc is None:
            return None
        _, p = _fullbox(buf, loc[0])
        (nchunk,) = struct.unpack_from(">I", buf, p)
        chunk_offsets = list(struct.unpack_from(f">{nchunk}Q", buf, p + 4))

    # stsc: samples per chunk, run-length encoded by first_chunk
    loc = table(b"stsc")
    if loc is None:
        return None
    _, p = _fullbox(buf, loc[0])
    (nruns,) = struct.unpack_from(">I", buf, p)
    runs = [struct.unpack_from(">III", buf, p + 4 + 12 * i) for i in range(nruns)]

    # stts: decode deltas, run-length encoded
    loc = table(b"stts")
    if loc is None:
        return None
    _, p = _fullbox(buf, loc[0])
    (ndelta,) = struct.unpack_from(">I", buf, p)
    deltas: list[int] = []
    for i in range(ndelta):
        if len(deltas) >= count:  # only `count` deltas are consumed;
            break                 # stop before corrupt runs blow memory
        cnt, delta = struct.unpack_from(">II", buf, p + 4 + 8 * i)
        if cnt > count:
            raise ValueError("stts count overflow")
        deltas.extend([delta] * min(cnt, count - len(deltas)))
    if len(deltas) < count:
        deltas.extend([deltas[-1] if deltas else 0] * (count - len(deltas)))

    samples: list[Mp4Sample] = []
    si = 0
    ts = 0
    for ci in range(len(chunk_offsets)):
        spc = 0
        for first, per_chunk, _desc in runs:
            if first <= ci + 1:
                spc = per_chunk
            else:
                break
        off = chunk_offsets[ci]
        for _ in range(spc):
            if si >= count:
                break
            size = sizes[si]
            if off + size > len(buf):
                raise ValueError("sample out of bounds")
            samples.append(Mp4Sample(off, size, ts * 1000 // timescale))
            off += size
            ts += deltas[si]
            si += 1
    if si != count:
        return None
    total_ms = duration * 1000 // timescale if duration else (
        ts * 1000 // timescale
    )
    return Mp4Track(timescale, total_ms, samples)


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def make_mp4(frames: list[bytes], frame_ms: int = 40, timescale: int = 1000,
             samples_per_chunk: int = 3) -> bytes:
    """Frame payloads -> structurally valid MP4: ftyp + mdat + moov with
    stts/stsc/stsz/stco over multiple chunks.  `frame_ms` is the uniform
    per-frame duration in milliseconds (at timescale=1000, delta ==
    frame_ms)."""
    if not frames:
        raise ValueError("need at least one frame")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = _box(b"mdat", b"".join(frames))
    mdat_payload_off = len(ftyp) + 8

    n = len(frames)
    delta = frame_ms * timescale // 1000
    duration = n * delta
    # chunk layout
    chunk_offsets = []
    off = mdat_payload_off
    i = 0
    while i < n:
        chunk_offsets.append(off)
        for j in range(i, min(i + samples_per_chunk, n)):
            off += len(frames[j])
        i += samples_per_chunk

    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    last = n - samples_per_chunk * (len(chunk_offsets) - 1)
    stsc_runs = [(1, samples_per_chunk, 1)]
    if last != samples_per_chunk and len(chunk_offsets) > 1:
        stsc_runs.append((len(chunk_offsets), last, 1))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + struct.pack(f">{n}I", *(len(f) for f in frames)))
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets))
                 + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets))
    # minimal mp4v visual sample entry (86 bytes per spec)
    entry = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
             + struct.pack(">HH", 16, 16) + struct.pack(">II", 0x480000, 0x480000)
             + b"\x00" * 4 + struct.pack(">H", 1) + b"\x00" * 32
             + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"mp4v", entry))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">HH", 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, duration)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                 + struct.pack(">II", 16 << 16, 16 << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">IH H", 0x10000, 0x0100, 0) + b"\x00" * 8
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
