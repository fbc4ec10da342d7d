"""Baseline JPEG (ITU-T.81) grayscale codec — stdlib + numpy, no PIL.

Closes the last "real codec" caveat from the r7 verdict: the engine's
multimodal fixtures previously stopped at the entropy-coding boundary
(JPEG/MP3/H.264 "need PIL/ffmpeg"). Baseline sequential JPEG for a
single 8-bit component needs none of that: the writer emits spec-correct
SOI/APP0/DQT/SOF0/DHT/SOS segments with the Annex K luminance
quantization + Huffman tables, forward-DCTs each 8×8 block (numpy
float64 matrix form), quantizes, zigzags, DPCM-codes the DC, run-length
+ Huffman-codes the AC with JPEG byte stuffing; the reader is the full
inverse — marker walk, DQT/DHT/SOF0/SOS parse (tables are read from the
FILE, not assumed), canonical Huffman decode, coefficient EXTEND,
dequantize, de-zigzag, IDCT, level shift, clamp, crop. Grayscale only
(one component, no chroma subsampling) and baseline only (no
progressive) — exactly the profile the synthetic fixtures need;
anything else raises ValueError like the other codecs'
malformed-payload paths. r9 (ADVICE): the marker walk skips spec-legal
0xFF fill bytes (B.1.1.2) and the scan decodes DRI/restart-interval
streams (byte-aligned RST sync, modulo-8 marker check, DC predictor
reset — E.2.4); the writer can emit them (``restart_interval=``) so the
restart path round-trips against this module's own streams.

Oracle strategy (why the fixtures are BLOCK-CONSTANT): JPEG is lossy,
so a SQL oracle cannot replay an arbitrary decode (it would need the
DCT). A block whose 64 pixels share one value ``v`` has exactly one
non-zero coefficient — DC = 8·(v−128) — so the decoded block is the
closed-form integer rule ``v' = clamp(2·floor((v−128)/2 + 0.5) + 128)``
(with the Annex K DC quantum 16), which DuckDB replays exactly. The
codec itself is general (property-tested on random non-constant blocks
for round-trip within quantization error); only the FIXTURE content is
block-constant, mirroring how the PNG/BMP fixtures carry a
SQL-replayable gradient.

Determinism note: quantization uses floor(x/q + 0.5 + 1e-9) — the 1e-9
nudge makes the float DCT's ±1e-12 noise around exact integer
boundaries (which block-constant content sits on) round the same way as
the oracle's exact integer arithmetic.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table (quality 50), natural order
QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)

# Annex K.3.1 / K.3.2: luminance DC and AC Huffman table specs
DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # [1..16]
DC_VALS = list(range(12))
AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> list[tuple[int, int]]:
    """The spec's zigzag scan as (row, col) pairs, generated (diagonal
    walk) rather than hand-typed."""
    order = []
    for d in range(15):
        rng = range(d + 1)
        for i in rng if d % 2 else reversed(rng):
            r, c = i, d - i
            if r < 8 and c < 8:
                order.append((r, c))
    return order


ZIGZAG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) for a JPEG BITS/HUFFVAL table spec."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
_AC_CODES = _canonical_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align (1-padding, stuffed if the pad byte lands on FF)
        and emit the RSTm marker — F.1.2.3 / B.2.1.2."""
        if self.n:
            self.put(0x7F, 8 - self.n)
        self.out.append(0xFF)
        self.out.append(0xD0 + (m & 7))


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _quantize(coefs: np.ndarray) -> np.ndarray:
    # floor(x/q + 0.5 + eps): deterministic half-up with the boundary
    # nudge documented in the module docstring
    return np.floor(coefs / QTABLE + 0.5 + 1e-9).astype(np.int32)


def encode_jpeg_gray(
    width: int, height: int, rows: list[bytes],
    restart_interval: int | None = None,
) -> bytes:
    """Spec-correct baseline grayscale JPEG of ``rows`` (height rows of
    width bytes). Edge blocks pad by edge replication (the standard
    choice — it adds no spurious AC energy on constant content).

    ``restart_interval`` (r9): emit a DRI segment and RST0-RST7 markers
    every that many MCUs (DC predictor reset, byte-aligned, modulo-8
    marker cycle — B.2.4.4 / F.1.2.3), exercising the decoder's
    restart-sync path with a stream this module itself produced."""
    if width < 1 or height < 1 or len(rows) != height:
        raise ValueError("bad dimensions")
    if restart_interval is not None and restart_interval < 1:
        raise ValueError("restart_interval must be >= 1")
    img = np.frombuffer(b"".join(bytes(r) for r in rows), dtype=np.uint8)
    img = img.reshape(height, width).astype(np.float64)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = np.pad(
        img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
    )

    w = _BitWriter()
    prev_dc = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if (
                restart_interval
                and mcu
                and mcu % restart_interval == 0
            ):
                w.restart(mcu // restart_interval - 1)
                prev_dc = 0
            mcu += 1
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coefs = _DCT @ block @ _DCT.T
            q = _quantize(coefs)
            zz = [int(q[r, c]) for r, c in ZIGZAG]
            # DC: DPCM + category + magnitude bits
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            t = _category(diff)
            w.put(*_DC_CODES[t])
            if t:
                w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            # AC: run-length of zeros + (run, size) symbols
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    w.put(*_AC_CODES[0xF0])  # ZRL
                    run -= 16
                s = _category(v)
                w.put(*_AC_CODES[(run << 4) | s])
                w.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                w.put(*_AC_CODES[0x00])  # EOB
    scan = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qz = bytes(int(QTABLE[r, c]) for r, c in ZIGZAG)
    dht_dc = bytes([0x00]) + bytes(DC_BITS[1:]) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS[1:]) + bytes(AC_VALS)
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, b"\x00" + qz)  # DQT: table 0, 8-bit
        + seg(  # SOF0: baseline, 8-bit, 1 component, no subsampling
            0xFFC0,
            struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
        )
        + seg(0xFFC4, dht_dc)
        + seg(0xFFC4, dht_ac)
        + dri
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
        + scan
        + b"\xff\xd9"  # EOI
    )


class _BitReader:
    """Entropy-segment bit reader with byte-unstuffing; a marker inside
    the scan (other than stuffed FF00) ends it."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("truncated JPEG scan")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.buf):
                    raise ValueError("truncated JPEG scan")
                nxt = self.buf[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, m: int) -> None:
        """Discard the partial byte, then consume the RSTm marker —
        tolerating a stuffed pad byte (FF00) and fill FFs before it
        (B.1.1.2 / E.2.4)."""
        self.n = 0
        while True:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("truncated JPEG scan at restart")
            b = self.buf[self.pos]
            if b != 0xFF:
                raise ValueError("lost sync at restart marker")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:  # stuffed pad byte — entropy filler
                self.pos += 2
                continue
            if nxt == 0xFF:  # fill byte before the marker
                self.pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                if nxt != 0xD0 + (m & 7):
                    raise ValueError("restart marker out of sequence")
                self.pos += 2
                return
            raise ValueError("expected restart marker in scan")


def _build_decode_table(bits: list[int], vals: list[int]):
    """(length, code) -> value maps for canonical Huffman decode."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def decode_jpeg_gray(buf: bytes) -> tuple[int, int, list[bytes]]:
    """Full inverse of :func:`encode_jpeg_gray` — and of any other
    baseline single-component 8-bit non-subsampled JPEG: tables come
    from the file's own DQT/DHT segments; spec-legal 0xFF fill bytes
    before markers (B.1.1.2) are skipped and DRI/restart-interval
    streams are decoded (DC predictor reset + modulo-8 marker check at
    each restart, E.2.4). Returns (width, height, rows)."""
    if buf[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comp_q = comp_dc = comp_ac = 0
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("malformed JPEG: lost marker sync")
        # B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while buf[pos + 1] == 0xFF and pos + 2 < len(buf):
            pos += 1
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("malformed JPEG: no scan data")
        if pos + 4 > len(buf):
            raise ValueError("truncated JPEG segment")
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        seg_end = pos + 2 + ln
        if seg_end > len(buf):
            raise ValueError("truncated JPEG segment")
        body = buf[pos + 4 : seg_end]
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros((8, 8))
                for i, (rr, cc) in enumerate(ZIGZAG):
                    t[rr, cc] = body[o + 1 + i]
                qtables[tq] = t
                o += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or ncomp != 1:
                raise ValueError(
                    "only baseline 8-bit single-component JPEG supported"
                )
            # component spec starts after the 6-byte frame header:
            # Cid at [6], H/V sampling at [7], quant-table id at [8]
            if body[7] != 0x11:
                raise ValueError("subsampled JPEG unsupported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = [0] + list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                o += 17 + nv
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            if ns != 1:
                raise ValueError("multi-component scan unsupported")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0xF
            pos = seg_end
            break
        pos = seg_end
    else:
        raise ValueError("malformed JPEG: no SOS marker")
    if width is None or comp_q not in qtables:
        raise ValueError("malformed JPEG: missing SOF0/DQT")
    if (0, comp_dc) not in huff or (1, comp_ac) not in huff:
        raise ValueError("malformed JPEG: missing DHT")
    qt = qtables[comp_q]
    dc_tab, ac_tab = huff[(0, comp_dc)], huff[(1, comp_ac)]

    r = _BitReader(buf, pos)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    prev_dc = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.sync_restart(mcu // restart_interval - 1)
                prev_dc = 0
            mcu += 1
            zz = [0] * 64
            t = _huff_decode(r, dc_tab)
            diff = _extend(r.bits(t), t) if t else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = _huff_decode(r, ac_tab)
                run, s = rs >> 4, rs & 0xF
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC coefficient index overrun")
                zz[k] = _extend(r.bits(s), s)
                k += 1
            coefs = np.zeros((8, 8))
            for i, (rr, cc) in enumerate(ZIGZAG):
                coefs[rr, cc] = zz[i] * qt[rr, cc]
            block = _DCT.T @ coefs @ _DCT + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.floor(block + 0.5 + 1e-9), 0, 255
            ).astype(np.uint8)
    cropped = out[:height, :width]
    return int(width), int(height), [bytes(cropped[y]) for y in range(height)]


def flat_roundtrip_value(v: int) -> int:
    """The closed-form decode of a block-constant value ``v`` through
    the Annex K DC quantum (16): what the SQL oracle replays —
    ``clamp(2*floor((v-128)/2 + 0.5) + 128, 0, 255)``."""
    import math

    return max(0, min(255, 2 * math.floor((v - 128) / 2 + 0.5) + 128))
