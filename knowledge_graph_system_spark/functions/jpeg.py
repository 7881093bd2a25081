"""Baseline-sequential JPEG codec, stdlib + numpy only (S2 closure).

The reference ingests arbitrary images via PIL (`/root/reference/api/
app/workers/ingestion_worker.py:209-330`); this container has no image
codec, and JPEG was the one format the multimodal path declared as a
NotImplementedError boundary. This module closes it with a real
baseline JFIF implementation:

- `decode_jpeg`: marker parse (DQT/DHT/SOF0/SOS/DRI), canonical Huffman
  entropy decode with byte unstuffing and restart markers, dequantize,
  dezigzag, float IDCT, nearest-neighbor chroma upsample for sampling
  factors 1-2, YCbCr→RGB. Progressive (SOF2), arithmetic, and 12-bit
  streams raise NotImplementedError — a declared boundary, not a crash.
- `encode_jpeg`: the matching writer used to build test fixtures —
  4:4:4, Annex-K quantization tables, and fixed-length canonical
  Huffman tables (every DC symbol 4 bits, every AC symbol 9 bits).
  Fixed-length tables are larger than the Annex-K optimum but are valid
  canonical codes any conformant decoder accepts, and they make the
  encoder deterministic and auditable.

Both sides treat quantization tables in zigzag order as the DQT segment
stores them. Lossy by nature: round-trip tests assert tolerance, not
equality (the SQL-oracled registered query sticks to the lossless
BMP/PPM/PNG formats).
"""

from __future__ import annotations

import struct

import numpy as np

# scan order: ZIGZAG[i] = natural (row-major) index of the i-th
# zigzag-scanned coefficient
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# ITU-T T.81 Annex K quantization tables (natural order)
Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# 8x8 DCT-II basis: D = T @ B @ T.T, inverse B = T.T @ D @ T
_T = np.array([
    [
        (0.5 * (1.0 / np.sqrt(2.0) if i == 0 else 1.0))
        * np.cos((2 * j + 1) * i * np.pi / 16.0)
        for j in range(8)
    ]
    for i in range(8)
])

# fixed-length canonical Huffman tables (see module docstring):
# 12 DC symbols at 4 bits, all 162 AC symbols at 9 bits
_DC_SYMS = list(range(12))
_AC_SYMS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0]
)
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMS)   # all length 4
_AC_BITS = [0] * 16
_AC_BITS[8] = len(_AC_SYMS)   # all length 9
_DC_CODE = {sym: (i, 4) for i, sym in enumerate(_DC_SYMS)}
_AC_CODE = {sym: (i, 9) for i, sym in enumerate(_AC_SYMS)}


def _category(v: int) -> int:
    s, a = 0, abs(int(v))
    while a:
        a >>= 1
        s += 1
    return s


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:   # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)   # pad with 1-bits per spec


def _encode_block(
    w: _BitWriter, block: np.ndarray, qt_zz: np.ndarray, dc_prev: int
) -> int:
    d = _T @ (block.astype(np.float64) - 128.0) @ _T.T
    zz = np.round(d.ravel()[ZIGZAG] / qt_zz).astype(np.int64)

    diff = int(zz[0]) - dc_prev
    s = _category(diff)
    code, ln = _DC_CODE[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODE[0xF0]   # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_CODE[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = _AC_CODE[0x00]   # EOB
        w.write(code, ln)
    return int(zz[0])


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    planes = [_pad8(np.clip(p, 0, 255)) for p in planes]
    qts_zz = [Q_LUMA[ZIGZAG], Q_CHROMA[ZIGZAG], Q_CHROMA[ZIGZAG]]

    out = bytearray(b"\xff\xd8")                     # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qt in ((0, Q_LUMA), (1, Q_CHROMA)):      # DQT, zigzag order
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(int(x) for x in qt[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)   # SOF0
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack("BBB", cid, 0x11, tq)     # 4:4:4
    for cls, dest, bits, syms in (
        (0, 0, _DC_BITS, _DC_SYMS), (1, 0, _AC_BITS, _AC_SYMS),
        (0, 1, _DC_BITS, _DC_SYMS), (1, 1, _AC_BITS, _AC_SYMS),
    ):                                               # DHT
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(syms), (cls << 4) | dest)
        out += bytes(bits) + bytes(syms)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)   # SOS
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack("BB", cid, tabs)
    out += b"\x00\x3f\x00"                           # Ss/Se/Ah-Al

    bw = _BitWriter()
    dc = [0, 0, 0]
    ph, pw = planes[0].shape
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(3):
                blk = planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                dc[ci] = _encode_block(bw, blk, qts_zz[ci], dc[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                               # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            m = self.data[self.pos] if self.pos < len(self.data) else None
            if m == 0x00:
                self.pos += 1          # stuffed byte
            elif m is not None and 0xD0 <= m <= 0xD7:
                raise _RestartHit(m)   # caller realigns
            else:
                raise _MarkerHit(m)    # EOI or next segment
        return b

    def read_bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.n = 0

    def consume_restart(self) -> None:
        self.byte_align()
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


class _RestartHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _MarkerHit(Exception):
    def __init__(self, marker: int | None) -> None:
        self.marker = marker


def _huff_decode_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman: DHT bits/values → {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    br: _BitReader,
    dc_table: dict,
    ac_table: dict,
    qt_zz: np.ndarray,
    dc_prev: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    s = _read_symbol(br, dc_table)
    diff = _extend(br.read_bits(s), s) if s else 0
    dc = dc_prev + diff
    zz[0] = dc
    i = 1
    while i < 64:
        sym = _read_symbol(br, ac_table)
        if sym == 0x00:      # EOB
            break
        run, s = sym >> 4, sym & 0x0F
        if s == 0:
            if run != 15:
                raise ValueError(f"bad AC symbol {sym:#x}")
            i += 16          # ZRL
            continue
        i += run
        if i > 63:
            raise ValueError("AC run past end of block")
        zz[i] = _extend(br.read_bits(s), s)
        i += 1
    blk = np.zeros(64, dtype=np.float64)
    blk[ZIGZAG] = zz * qt_zz
    return _T.T @ blk.reshape(8, 8) @ _T, dc


def decode_jpeg(raw: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (or (h, w, 1) for
    single-component grayscale streams)."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    pos = 2
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:   # EOI
            break
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0); got SOF marker {marker:#x}"
            )
        (seglen,) = struct.unpack(">H", raw[pos:pos + 2])
        body = raw[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += seglen
        if marker == 0xDB:   # DQT (may hold several tables)
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qts[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=bpos + 1
                ).astype(np.float64)
                bpos += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            bpos = 0
            while bpos < len(body):
                cls, dest = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = body[bpos + 17 : bpos + 17 + nv]
                huff[(cls, dest)] = _huff_decode_table(bits, vals)
                bpos += 17 + nv
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(f"sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            nc = body[0]
            order = []
            for c in range(nc):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"] = huff[(0, tabs >> 4)]
                comp["ac"] = huff[(1, tabs & 0x0F)]
                order.append(comp)
            return _decode_scan(raw, pos, order, qts, h, w, restart_interval)
    raise ValueError("no SOS segment found")


def _decode_scan(
    raw: bytes,
    pos: int,
    comps: list[dict],
    qts: dict[int, np.ndarray],
    h: int,
    w: int,
    restart_interval: int,
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["plane"] = np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
        c["qt_zz"] = qts[c["tq"]]
        c["pred"] = 0

    br = _BitReader(raw, pos)
    done_mcus = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and done_mcus and done_mcus % restart_interval == 0:
                br.consume_restart()
                for c in comps:
                    c["pred"] = 0
            try:
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk, c["pred"] = _decode_block(
                                br, c["dc"], c["ac"], c["qt_zz"], c["pred"]
                            )
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            c["plane"][y0:y0 + 8, x0:x0 + 8] = blk + 128.0
            except _RestartHit:
                raise ValueError("restart marker inside an MCU") from None
            except _MarkerHit as m:
                raise ValueError(
                    f"entropy stream ended early at marker {m.marker}"
                ) from None
            done_mcus += 1

    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
