"""Pure-stdlib/numpy baseline JPEG codec.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
any H/V sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0), restart markers,
multiple DQT/DHT segments.  Returns ``None`` for anything outside that
subset (progressive SOF2, arithmetic coding, 12-bit) rather than
guessing.

Encoder (`make_jpeg`): baseline fixture writer — 4:4:4 or 4:2:0, own
quantization tables (embedded in DQT, so any table is spec-valid) and
fixed-length prefix codes declared via DHT (a degenerate but perfectly
legal Huffman table: every symbol at one code length, the all-ones code
left unused per T.81 C.2).  Output is real JPEG any decoder can read;
compression ratio is not the point, exercising the decoder's full
marker/entropy/IDCT path is.

Reference parity note: the reference pipeline outsources image decoding
to Pillow (see /root/reference requirements); this module replaces that
dependency for the baseline-JPEG subset in-sandbox.  JPEG is lossy:
round-trip tests assert bounded per-pixel error, exact only where the
quantizer is 1 and the image is DCT-sparse.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """The T.81 zigzag scan order as flat indices into a row-major 8x8."""
    order = []
    for s in range(15):
        rng = range(s + 1) if s % 2 else range(s, -1, -1)
        for i in rng:
            j = s - i
            if i < 8 and j < 8:
                order.append(i * 8 + j)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()          # zigzag position -> raster index
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal DCT-II basis: F = C @ b @ C.T ; b = C.T @ F @ C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing.
    Stops at any real marker (0xFF xx, xx != 0); RST markers are consumed
    explicitly via `restart()`."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.buf[self.pos] if self.pos < len(self.buf) else None
        if b is None:
            return False
        if b == 0xFF:
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker pending
            else:
                return False  # real marker (EOI etc.)
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # T.81 F.2.2.5: pad with 1-bits at the end of a scan
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def restart(self) -> None:
        """Discard partial byte, consume the RSTn marker."""
        self.bits = 0
        self.nbits = 0
        while self.pos + 1 < len(self.buf):
            if self.buf[self.pos] == 0xFF and 0xD0 <= self.buf[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _Huff:
    """Canonical JPEG Huffman table -> (min/max code per length) decoder."""

    def __init__(self, counts: list[int], values: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            code += counts[length - 1]
            k += counts[length - 1]
            self.maxcode[length] = code - 1 if counts[length - 1] else -1
            code <<= 1
        self.values = values

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            if self.maxcode[length] >= 0 and code <= self.maxcode[length]:
                return self.values[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("bad Huffman code")


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (or (h, w) for grayscale);
    None when out of subset."""
    if payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode(payload)
    except (ValueError, IndexError, KeyError, struct.error,
            ZeroDivisionError, OverflowError):
        # KeyError: scans referencing undeclared Huffman/quant tables or
        # components (incl. legal multi-scan layouts outside this
        # decoder's single-scan subset); OverflowError: a malformed DHT
        # can declare DC categories > 18, whose magnitudes overflow the
        # int32 coefficient block
        return None


def _decode(buf: bytes) -> np.ndarray | None:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) ; comps = [(cid, hs, vs, tq)]
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        j = pos + 1
        while j < len(buf) and buf[j] == 0xFF:
            j += 1
        if j >= len(buf):
            break
        marker = buf[j]
        pos = j + 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", buf, pos)[0]
        seg = buf[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:  # 16-bit tables: out of baseline subset
                    return None
                tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                qt[tq] = tbl[UNZIGZAG].reshape(8, 8)
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                huff[(tc, th)] = _Huff(counts, seg[i + 17 : i + 17 + n])
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tda >> 4, tda & 15)
            return _decode_scan(
                buf, pos + seglen, frame, qt, huff, scan_tables, restart_interval
            )
        pos += seglen
    return None


def _decode_scan(buf, pos, frame, qt, huff, scan_tables, restart_interval):
    h, w, comps = frame
    if len(comps) == 1:
        # T.81 A.2.2/J.1: a single-component scan is NON-interleaved —
        # the MCU is one data unit and the SOF sampling factors do not
        # shape the entropy stream (they only relate components to each
        # other, of which there are none)
        cid, _, _, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    br = _BitReader(buf, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = {cid: 0 for cid in pred}
            mcu_count += 1
            for cid, hs, vs, tq in comps:
                dc_t = huff[(0, scan_tables[cid][0])]
                ac_t = huff[(1, scan_tables[cid][1])]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coef = np.zeros(64, dtype=np.int32)
                        s = dc_t.decode(br)
                        if s > 11:  # baseline DC categories are 0-11
                            raise ValueError("bad DC category")
                        pred[cid] += _extend(br.read(s), s)
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s > 10:  # baseline AC sizes are 1-10
                                raise ValueError("bad AC size")
                            if s == 0:
                                if r != 15:
                                    break
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[ZIGZAG[k]] = _extend(br.read(s), s)
                            k += 1
                        block = coef.reshape(8, 8) * q
                        pix = _C.T @ block @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
    # upsample to full resolution and crop
    out_planes = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixture writer)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bits = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.bits = (self.bits << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bits >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.bits &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _fixed_code_table(symbols: list[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """All symbols at one code length L with 2**L > len(symbols)
    (all-ones code unused, per T.81 C.2).  Returns (BITS counts, HUFFVAL,
    symbol -> (code, length))."""
    n = len(symbols)
    length = 1
    while (1 << length) <= n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    values = bytes(symbols)
    enc = {sym: (i, length) for i, sym in enumerate(symbols)}
    return counts, values, enc


# legal baseline symbol alphabets: DC categories 0-11; AC EOB, ZRL and
# (run 0-15, size 1-10)
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category s, s-bit magnitude code)."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


_Q_LUMA = np.clip(np.arange(64).reshape(8, 8) // 8 + np.arange(8) + 4, 1, 255).astype(np.int32)
_Q_CHROMA = np.clip(_Q_LUMA * 2, 1, 255).astype(np.int32)


def make_jpeg(rgb: np.ndarray, subsample: str = "444",
              restart_interval: int = 0, scale: float = 1.0) -> bytes:
    """(h, w, 3) uint8 -> baseline JFIF bytes ((h, w) -> single-component
    grayscale).  subsample: '444' or '420' (ignored for grayscale).
    `scale` scales the quantization tables (smaller = higher fidelity;
    tables are clipped to [1, 255])."""
    if subsample not in ("444", "420"):
        raise ValueError(subsample)
    gray = rgb.ndim == 2
    if gray:
        h, w = rgb.shape
        y = rgb.astype(np.float64)
        cb = cr = None
        subsample = "444"
    else:
        h, w, _ = rgb.shape
        f = rgb.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
        cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]

    qy = np.clip(np.round(_Q_LUMA * scale), 1, 255).astype(np.int32)
    qc = np.clip(np.round(_Q_CHROMA * scale), 1, 255).astype(np.int32)

    if gray:
        samp = [(1, 1)]
        mcu_w = mcu_h = 8
    elif subsample == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
        mcu_w = mcu_h = 8
    else:
        samp = [(2, 2), (1, 1), (1, 1)]
        mcu_w = mcu_h = 16

    def pad(plane, ph, pw):
        return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                      mode="edge")

    mcux = -(-w // mcu_w)
    mcuy = -(-h // mcu_h)
    y = pad(y, mcuy * mcu_h, mcux * mcu_w)
    if gray:
        planes = [y]
        quants = [qy]
    else:
        if subsample == "420":
            cb = pad(cb, mcuy * mcu_h, mcux * mcu_w)
            cr = pad(cr, mcuy * mcu_h, mcux * mcu_w)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        else:
            cb = pad(cb, mcuy * 8, mcux * 8)
            cr = pad(cr, mcuy * 8, mcux * 8)
        planes = [y, cb, cr]
        quants = [qy, qc, qc]

    dc_counts, dc_vals, dc_enc = _fixed_code_table(_DC_SYMBOLS)
    ac_counts, ac_vals, ac_enc = _fixed_code_table(_AC_SYMBOLS)

    nc = len(planes)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    q_tables = ((0, qy),) if gray else ((0, qy), (1, qc))
    for tq, q in q_tables:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(v) for v in q.reshape(-1)[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c, (hs, vs) in enumerate(samp):
        out += bytes([c + 1, (hs << 4) | vs, 0 if c == 0 else 1])
    for tc in (0, 1):
        counts, vals = (dc_counts, dc_vals) if tc == 0 else (ac_counts, ac_vals)
        for th in range(1 if gray else 2):
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
            out += bytes(counts) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0 if c == 0 else 0x11])
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            mcu_count += 1
            for c, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = planes[c][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = np.round((_C @ block @ _C.T) / quants[c]).astype(np.int64)
                        zz = coef.reshape(-1)[ZIGZAG]
                        # baseline AC size category caps at 10
                        zz[1:] = np.clip(zz[1:], -1023, 1023)
                        diff = int(zz[0]) - pred[c]
                        pred[c] = int(zz[0])
                        s, bits = _magnitude(diff)
                        code, length = dc_enc[s]
                        bw.write(code, length)
                        if s:
                            bw.write(bits, s)
                        run = 0
                        last_nz = int(np.nonzero(zz)[0].max()) if np.any(zz) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, length = ac_enc[0xF0]
                                bw.write(code, length)
                                run -= 16
                            s, bits = _magnitude(v)
                            code, length = ac_enc[(run << 4) | s]
                            bw.write(code, length)
                            bw.write(bits, s)
                            run = 0
                        if last_nz < 63:
                            code, length = ac_enc[0x00]
                            bw.write(code, length)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
