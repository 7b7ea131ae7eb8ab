"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.  Decode is REAL for the formats the
standard library can parse — uncompressed BMP (24/32-bit BI_RGB), binary
PPM/PGM, **PNG** (zlib IDAT, filters 0-4, 8-bit gray/RGB/palette/
gray+alpha/RGBA, non-interlaced), **GIF** (87a/89a, full LZW
decode/encode with 12-bit dict reset, interlace, local color tables),
PCM WAV (8/16-bit, via ``wave``), and **baseline JPEG** (SOF0 Huffman +
IDCT, 4:4:4/4:2:2/4:2:0, restart markers — `jpeg_codec.py`) — with
round-trip tests against the fixture writers (byte-exact for the
lossless formats, bounded-error for JPEG).  **Video** composes the MP4
container parser with the JPEG decoder: an MP4 whose samples are JPEG
images (Motion-JPEG) decodes end-to-end — container sample tables
locate the frame bytes, `jpeg_codec` decodes the pixels (``decoded =
true``).  Only non-JPEG codec bitstreams (H.264 etc.) remain out of
scope — no stdlib entropy decoder exists for them in this container —
and those payloads fall back to a clearly-marked deterministic STUB
(``decoded = false`` in the feature output); swap the fallback for
ffmpeg in production — nothing else changes.

Schema:
    media(media_id long, url string, kind string,      -- image|audio|video
          payload binary, mime string, width int, height int,
          duration_ms int)
Feature output:
    features(media_id long, kind string, n_bytes int, decoded boolean,
             feature array<float>)   -- fixed-dim feature vector
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from document_retrieval_system_spark.sources.jpeg_codec import decode_jpeg, make_jpeg
from document_retrieval_system_spark.sources.mp4_box import make_mp4, parse_mp4_samples

MEDIA_SCHEMA = (
    "media_id long, url string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, decoded boolean, "
    "feature array<float>"
)


# ---------------------------------------------------------------------------
# real stdlib decoders (+ matching fixture writers)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed bottom-up 24/32-bit BI_RGB BMP -> (h, w, 3) uint8
    RGB array; None when out of subset (compression, palettes, top-down)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if (hdr_size < 40 or compression != 0 or planes != 1
            or bpp not in (24, 32) or w <= 0 or h <= 0):
        return None
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    need = data_off + row_bytes * h
    if len(payload) < need:
        return None
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(
            payload, dtype=np.uint8, count=w * nch,
            offset=data_off + y * row_bytes,
        ).reshape(w, nch)
        # rows are bottom-up, channels are BGR(A)
        out[h - 1 - y] = row[:, [2, 1, 0]]
    return out


def make_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> 24-bit uncompressed BMP (round-trips through
    decode_bmp exactly)."""
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):
        out += rgb[y, :, ::-1].tobytes() + pad
    return bytes(out)


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Binary P6 PPM -> (h, w, 3) uint8; binary P5 PGM -> (h, w) uint8."""
    if payload[:2] not in (b"P6", b"P5"):
        return None
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    nch = 3 if payload[:2] == b"P6" else 1
    need = w * h * nch
    if len(payload) - i < need:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
    return arr.reshape((h, w, 3) if nch == 3 else (h, w))


def make_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type: 0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> None:
    """In-place Paeth unfilter (sequential by definition: each byte's
    predictor uses the already-reconstructed left neighbor)."""
    n = cur.size
    for i in range(n):
        a = int(cur[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        cur[i] = (int(cur[i]) + pred) & 0xFF


def decode_png(payload: bytes) -> np.ndarray | None:
    """Pure-stdlib PNG decoder (zlib IDAT, filters 0-4), 8-bit
    gray / RGB / palette / gray+alpha / RGBA, non-interlaced.

    Returns (h, w) uint8 for grayscale (alpha dropped), (h, w, 3) for
    RGB/palette/RGBA (alpha dropped); None for anything out of subset
    (16-bit, Adam7 interlace, bad CRC, truncated stream)."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        return None
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) != length or pos + 12 + length > len(payload):
                return None
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                return None
            pos += 12 + length
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
        if ihdr is None or not idat:
            return None
        w, h, depth, color_type, comp, filt, interlace = ihdr
        if (depth != 8 or comp != 0 or filt != 0 or interlace != 0
                or color_type not in _PNG_CHANNELS or w <= 0 or h <= 0):
            return None
        nch = _PNG_CHANNELS[color_type]
        stride = w * nch
        raw = zlib.decompress(bytes(idat))
        if len(raw) != (stride + 1) * h:
            return None
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            ftype = raw[y * (stride + 1)]
            cur = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
            ).copy()
            if ftype == 0:
                pass
            elif ftype == 1:  # Sub
                for i in range(nch, stride):
                    cur[i] = (int(cur[i]) + int(cur[i - nch])) & 0xFF
            elif ftype == 2:  # Up
                cur = (cur.astype(np.int16) + prev).astype(np.uint8)
            elif ftype == 3:  # Average
                for i in range(stride):
                    a = int(cur[i - nch]) if i >= nch else 0
                    cur[i] = (int(cur[i]) + (a + int(prev[i])) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                _paeth_row(cur, prev, nch)
            else:
                return None
            out[y] = cur
            prev = out[y]
        px = out.reshape(h, w, nch)
        if color_type == 0:
            return px[:, :, 0]
        if color_type == 2:
            return px
        if color_type == 3:
            if plte is None or int(px.max()) >= len(plte):
                return None
            return plte[px[:, :, 0]]
        if color_type == 4:
            return px[:, :, 0]  # gray, alpha dropped
        return px[:, :, :3]  # RGBA -> RGB, alpha dropped
    except Exception:
        return None


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def make_png(img: np.ndarray, filters=0) -> bytes:
    """uint8 image -> PNG: (h, w) gray, (h, w, 3) RGB, (h, w, 4) RGBA.

    ``filters``: per-row filter type (int) or a list cycled over rows —
    tests exercise every unfilter path (0 none / 1 sub / 2 up /
    3 average / 4 paeth) through the same writer."""
    import zlib

    if img.ndim == 2:
        color_type, nch = 0, 1
        px = img[:, :, None]
    elif img.shape[2] == 3:
        color_type, nch = 2, 3
        px = img
    else:
        color_type, nch = 6, 4
        px = img
    h, w = px.shape[:2]
    stride = w * nch
    flat = px.reshape(h, stride).astype(np.uint8)
    if isinstance(filters, int):
        filters = [filters]
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = filters[y % len(filters)]
        cur = flat[y].astype(np.int16)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            left = np.zeros(stride, dtype=np.int16)
            left[nch:] = cur[:-nch]
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            left = np.zeros(stride, dtype=np.int16)
            left[nch:] = cur[:-nch]
            enc = cur - (left + prev) // 2
        elif ftype == 4:
            enc = np.empty(stride, dtype=np.int16)
            for i in range(stride):
                a = int(cur[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = cur[i] - pred
        else:
            raise ValueError(f"unsupported filter {ftype}")
        raw.append(ftype)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _lzw_decode(data: bytes, min_code_size: int) -> list[int] | None:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    clear/end codes, dict capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None  # corrupt stream
            out.extend(entry)
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW encoder (dict reset at 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= (1 << 12):
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray | None:
    """Pure-stdlib GIF87a/89a decoder: first frame -> (h, w, 3) uint8 via
    the active color table; handles interlace, local color tables, and
    extension blocks; None for anything out of subset/corrupt."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    try:
        sw, sh, packed = struct.unpack_from("<HHB", payload, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        while pos < len(payload):
            b0 = payload[pos]
            pos += 1
            if b0 == 0x3B:  # trailer
                return None
            if b0 == 0x21:  # extension: skip label + sub-blocks
                pos += 1
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if b0 != 0x2C:
                return None
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None or w <= 0 or h <= 0:
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(data), min_code)
            if idx is None or len(idx) < w * h:
                return None
            arr = np.asarray(idx[: w * h], dtype=np.int32).reshape(h, w)
            if ipacked & 0x40:  # interlace: rows in 4-pass order
                order = []
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    order.extend(range(start, h, step))
                de = np.empty_like(arr)
                de[order] = arr
                arr = de
            if int(arr.max()) >= len(ct):
                return None
            return ct[arr]
    except (IndexError, struct.error):
        return None
    return None


def make_gif(indexed: np.ndarray, palette: np.ndarray,
             interlace: bool = False) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) palette -> single-frame GIF
    (round-trips through decode_gif to palette[indexed] exactly)."""
    h, w = indexed.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    rows = indexed
    if interlace:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        rows = indexed[order]
    min_code = max(2, bits)
    out.append(min_code)
    data = _lzw_encode(rows.astype(np.uint8).tobytes(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """PCM WAV -> (float32 samples in [-1, 1] of the first channel,
    sample_rate); None for non-PCM / out-of-subset files."""
    try:
        with wave.open(io.BytesIO(payload)) as f:
            nch, sw, rate = f.getnchannels(), f.getsampwidth(), f.getframerate()
            frames = f.readframes(f.getnframes())
    except Exception:
        return None
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
               - 128.0) / 128.0
    else:
        return None
    if nch > 1:
        arr = arr[::nch]
    return arr, rate


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float32 [-1, 1] mono -> 16-bit PCM WAV (round-trips through
    decode_wav to within one quantization step)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def _image_features(img: np.ndarray) -> np.ndarray:
    """Fixed-dim real features: dims + per-channel mean/std + a 6-bin
    grayscale histogram, padded to FEATURE_DIM."""
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    h, w, _ = img.shape
    f = img.reshape(-1, 3).astype(np.float64)
    gray = f.mean(axis=1)
    hist, _ = np.histogram(gray, bins=6, range=(0, 256))
    feat = np.array(
        [w, h, *(f.mean(axis=0) / 255.0), *(f.std(axis=0) / 255.0),
         *(hist / max(1, gray.size))],
        dtype=np.float32,
    )
    return np.pad(feat, (0, FEATURE_DIM - feat.size))[:FEATURE_DIM]


def _audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """n / rate / mean / std / rms / peak / zero-crossing rate, padded."""
    s = samples.astype(np.float64)
    zcr = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if s.size > 1 else 0.0
    feat = np.array(
        [s.size, rate, s.mean() if s.size else 0.0,
         s.std() if s.size else 0.0,
         float(np.sqrt(np.mean(s * s))) if s.size else 0.0,
         float(np.abs(s).max()) if s.size else 0.0, zcr],
        dtype=np.float32,
    )
    return np.pad(feat, (0, FEATURE_DIM - feat.size))[:FEATURE_DIM]


def decode_mjpeg_mp4(payload: bytes) -> np.ndarray | None:
    """Motion-JPEG MP4 -> first frame's pixels: the container's sample
    tables locate the frame bytes, the JPEG decoder yields the image.
    None when the payload isn't a parseable MP4 or its samples aren't
    JPEG (H.264 etc. — documented out of scope, production: ffmpeg)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    trk = parse_mp4_samples(payload)
    if trk is None or not trk.samples:
        return None
    s = trk.samples[0]
    frame = payload[s.offset : s.offset + s.size]
    if frame[:2] != b"\xff\xd8":
        return None
    return decode_jpeg(frame)


def make_mjpeg_mp4(frames_px: list[np.ndarray], frame_ms: int = 40,
                   samples_per_chunk: int = 3, scale: float = 1.0) -> bytes:
    """Pixel arrays -> a Motion-JPEG MP4: each frame JPEG-encoded, then
    packed as the container's samples (round-trips through
    decode_mjpeg_mp4 / sample_frames + decode_jpeg)."""
    return make_mp4([make_jpeg(px, scale=scale) for px in frames_px],
                    frame_ms=frame_ms, samples_per_chunk=samples_per_chunk)


def decode_media(payload: bytes) -> np.ndarray | None:
    """Magic-byte dispatch to the real decoders; None if no stdlib
    decoder applies (non-JPEG video codecs — production swaps in
    ffmpeg)."""
    if payload[:2] == b"BM":
        img = decode_bmp(payload)
        if img is not None:
            return _image_features(img)
    if payload[:2] in (b"P6", b"P5"):
        img = decode_ppm(payload)
        if img is not None:
            return _image_features(img)
    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
        if img is not None:
            return _image_features(img)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        img = decode_gif(payload)
        if img is not None:
            return _image_features(img)
    if payload[:2] == b"\xff\xd8":
        img = decode_jpeg(payload)
        if img is not None:
            return _image_features(img)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        got = decode_wav(payload)
        if got is not None:
            return _audio_features(*got)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        img = decode_mjpeg_mp4(payload)
        if img is not None:
            return _image_features(img)
    return None


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic FALLBACK for compressed formats this container
    cannot decode: pseudo-features from the payload hash (production:
    ``PIL.Image.open`` / ffmpeg).  Rows that took this path carry
    ``decoded = false``."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint8)
    return arr.astype(np.float32).reshape(FEATURE_DIM, 4).mean(axis=1) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction; one map stage, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nb, dec = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    nb.append(0)
                    dec.append(False)
                    continue
                payload = bytes(payload)
                real = decode_media(payload)
                if real is not None:
                    feats.append(real.tolist())
                    dec.append(True)
                else:
                    feats.append(_decode_image_stub(payload).tolist())
                    dec.append(False)
                nb.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nb, dtype="int32"),
                    "decoded": pd.Series(dec, dtype="bool"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, out_w int, out_h int, pixels binary"
)
FRAME_SCHEMA = "media_id long, frame_no int, ts_ms int, frame binary"


def _decode_pixels_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode to a (height, width) uint8 image; production swaps in
    PIL — the deterministic fake keeps the RESIZE math below testable."""
    need = width * height
    digest = hashlib.sha256(payload).digest()
    buf = (digest * (need // len(digest) + 1))[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width)


def resize_images(media: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Resize stage: decode (REAL for BMP/PPM/PGM payloads — grayscale of
    the decoded pixels; deterministic stub for compressed formats) ->
    nearest-neighbor resample -> packed bytes.  One Arrow map stage, no
    shuffle; the scan reads only (media_id, kind, payload, width,
    height) — metadata columns prune."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.payload is None or not row.width or not row.height:
                    out.append(None)
                    continue
                payload = bytes(row.payload)
                img = None
                if payload[:2] == b"BM":
                    img = decode_bmp(payload)
                elif payload[:2] in (b"P6", b"P5"):
                    img = decode_ppm(payload)
                elif payload[:8] == _PNG_SIG:
                    img = decode_png(payload)
                elif payload[:6] in (b"GIF87a", b"GIF89a"):
                    img = decode_gif(payload)
                elif payload[:2] == b"\xff\xd8":
                    img = decode_jpeg(payload)
                elif len(payload) >= 12 and payload[4:8] == b"ftyp":
                    img = decode_mjpeg_mp4(payload)  # MJPEG first frame
                if img is not None:
                    if img.ndim == 3:
                        img = img.mean(axis=2).astype(np.uint8)
                else:
                    img = _decode_pixels_stub(payload, int(row.width),
                                              int(row.height))
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                out.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"],
                 "out_w": pd.Series([out_w] * len(pdf), dtype="int32"),
                 "out_h": pd.Series([out_h] * len(pdf), dtype="int32"),
                 "pixels": out}
            )

    return media.select("media_id", "kind", "payload", "width", "height").mapInPandas(
        run, RESIZED_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    timestamp (t = 0, every_ms, 2*every_ms, ... < duration_ms).  For
    payloads that parse as MP4 the frame bytes are REAL — the container's
    stts/stsc/stsz/stco sample tables locate the sample covering each
    grid point and its exact byte range + decode timestamp are emitted
    (`sources/mp4_box.py`); Motion-JPEG samples are then directly
    decodable by `decode_jpeg` (non-JPEG codec bitstreams — H.264 etc.
    — stay undecoded; production: ffmpeg).  Unparseable payloads keep
    the deterministic hash stub.  The EXPLODE-shaped Arrow batch flow — one
    input row fanning out to duration/every_ms output rows — happens
    inside the Python worker so no JVM-side row blow-up precedes the
    per-frame work."""
    from bisect import bisect_right

    from document_retrieval_system_spark.sources.mp4_box import parse_mp4_samples

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, tss, frames = [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.payload is None or row.kind != "video" or not row.duration_ms:
                    continue
                n_frames = max(1, int(row.duration_ms) // every_ms)
                payload = bytes(row.payload)
                trk = parse_mp4_samples(payload)
                if trk is not None and trk.samples:
                    ts_index = [s.ts_ms for s in trk.samples]
                    for f in range(n_frames):
                        k = max(0, bisect_right(ts_index, f * every_ms) - 1)
                        s = trk.samples[k]
                        ids.append(row.media_id)
                        fnos.append(f)
                        tss.append(s.ts_ms)
                        frames.append(payload[s.offset : s.offset + s.size])
                    continue
                for f in range(n_frames):
                    ids.append(row.media_id)
                    fnos.append(f)
                    tss.append(f * every_ms)
                    frames.append(
                        hashlib.sha256(payload + f.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_no": pd.Series(fnos, dtype="int32"),
                 "ts_ms": pd.Series(tss, dtype="int32"),
                 "frame": frames}
            )

    return media.select("media_id", "kind", "payload", "duration_ms").mapInPandas(
        run, FRAME_SCHEMA
    )


def synthetic_media_df(spark, n: int = 64):
    """Deterministic media fixture.  Image rows alternate REAL formats
    (BMP / P6 PPM, pixels derived from the id) so the pipeline exercises
    the genuine decoders; audio rows are real PCM WAV sine-ish tones;
    video rows alternate REAL Motion-JPEG MP4 containers (sample tables
    resolve true byte ranges AND the JPEG frames decode to pixels,
    ``decoded = true``) and opaque bytes (the documented stub path for
    codecs with no stdlib decoder — H.264 etc., ``decoded = false``)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 8 + i % 24, 8 + (i * 3) % 24
        if kind == "image":
            px = np.frombuffer(
                (hashlib.sha256(f"img-{i}".encode()).digest()
                 * (w * h * 3 // 32 + 1))[: w * h * 3], dtype=np.uint8,
            ).reshape(h, w, 3)
            fmt = (i // 3) % 5
            if fmt == 0:
                payload, mime = make_bmp(px), "image/bmp"
            elif fmt == 1:
                payload, mime = make_ppm(px), "image/x-portable-pixmap"
            elif fmt == 2:
                payload, mime = make_png(px, filters=[0, 1, 2, 3, 4]), "image/png"
            elif fmt == 4:
                # vary by i//3 — image rows all have i % 3 == 0, so a
                # bare i % k would be constant across the fixture
                payload = make_jpeg(px, subsample="420" if i % 2 else "444",
                                    restart_interval=(i // 3) % 3)
                mime = "image/jpeg"
            else:
                pal = np.frombuffer(
                    hashlib.sha256(f"pal-{i}".encode()).digest() * 6,
                    dtype=np.uint8,
                )[:192].reshape(64, 3)
                payload = make_gif((px[:, :, 0] % 64).astype(np.uint8), pal,
                                   interlace=(i % 2 == 0))
                mime = "image/gif"
        elif kind == "audio":
            t = np.arange(800 + 16 * i, dtype=np.float64)
            payload = make_wav(
                np.sin(2 * np.pi * (110 + 13 * i) * t / 8000.0) * 0.5, 8000
            )
            mime = "audio/wav"
        else:
            mime = "video/mp4"
            if (i // 3) % 2 == 0:
                # REAL Motion-JPEG MP4: sample tables resolve to JPEG
                # frames that decode to pixels end-to-end (frame_ms
                # varies by i//3 — video rows all have i % 3 == 2, so
                # i % 3 would be constant)
                n_fr = 3 + i % 5
                frame_ms = 400 + 200 * ((i // 3) % 3)
                frames_px = [
                    np.frombuffer(
                        (hashlib.sha256(f"frame-{i}-{k}".encode()).digest()
                         * (w * h * 3 // 32 + 1))[: w * h * 3],
                        dtype=np.uint8,
                    ).reshape(h, w, 3)
                    for k in range(n_fr)
                ]
                payload = make_mjpeg_mp4(frames_px, frame_ms=frame_ms,
                                         samples_per_chunk=2)
                dur = n_fr * frame_ms
            else:
                payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
                dur = 1000 * (i % 90)
            rows.append(
                (i, f"https://cdn.example.com/m/{i}", kind, payload, mime, w, h, dur)
            )
            continue
        rows.append(
            (i, f"https://cdn.example.com/m/{i}", kind, payload,
             mime, w, h, 1000 * (i % 90))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
