"""Minimal pure-Python baseline JPEG codec — stdlib + numpy only.

Vendored from the PUBLIC spec (ITU-T T.81 / ISO 10918-1, baseline
sequential DCT process) so the multimodal operators can decode the
dominant real-world image format without Pillow (absent from this
container). ↔ reference scope note: Citus itself stores media as
bytea and delegates decode to client libraries; this codec is the
engine-extension analog (operators/imagecodec.py pattern).

Supported on DECODE: baseline sequential DCT (SOF0), 8-bit samples,
Huffman entropy coding with arbitrary DHT tables, 1-component
(grayscale) or 3-component YCbCr scans, common subsampling factors
(4:4:4, 4:2:2, 4:2:0 — any h,v ≤ 2), restart markers, byte stuffing.
Rejected LOUDLY with the offending field named: progressive (SOF2),
extended/12-bit, arithmetic coding (SOF9+), hierarchical, unknown
markers inside a scan.

ENCODE writes spec-valid baseline JPEG with self-describing tables:
uniform-length canonical Huffman tables (4-bit DC / 8-bit AC codes —
valid, suboptimal, and free of transcription risk vs the Annex K
example tables) and a flat quantization table scaled by `quality`.
At quality=100 the table is all-ones, so blocks whose FDCT is exact
in float64 (e.g. per-block-uniform images) roundtrip BIT-EXACTLY —
the property the oracle entry pins.

Like the PNG codec, this is a *codec*, not an imaging library:
decode to (h, w, c) uint8, encode from the same.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants

_ZIGZAG = []  # (row, col) in zigzag order, generated (no transcription)
for _s in range(15):
    _rows = range(max(0, _s - 7), min(7, _s) + 1)
    # odd diagonals walk row-ascending, even ones row-descending
    for _r in (_rows if _s % 2 else reversed(_rows)):
        _ZIGZAG.append((_r, _s - _r))
_ZZ_ROWS = np.array([p[0] for p in _ZIGZAG])
_ZZ_COLS = np.array([p[1] for p in _ZIGZAG])

# orthonormal 8-point DCT-II basis: A @ A.T == I;
# FDCT: A @ block @ A.T, IDCT: A.T @ coef @ A
_A = np.array(
    [
        [
            0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _quant_table(quality: int) -> np.ndarray:
    """Flat base table (16s) scaled by the common IJG quality mapping;
    quality=100 → all ones (lossless for DC-only blocks)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality {quality} not in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (16 * scale + 50) // 100
    return np.full((8, 8), max(1, min(255, tbl)), dtype=np.int64)


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside scan"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


# ---------------------------------------------------------------------------
# Huffman


def _canonical_codes(counts: list[int], symbols: list[int]):
    """(length→count, symbols in order) → {(length, code): symbol} and
    the inverse {symbol: (code, length)} — T.81 Annex C procedure."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            sym = symbols[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


def _read_huffman_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size`-bit magnitude to signed."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(value: int) -> int:
    return int(value).bit_length() if value > 0 else int(-value).bit_length()


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, channels) uint8 (channels 1 or 3,
    RGB for color per the JFIF YCbCr transform)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization unsupported")
                vals = np.frombuffer(
                    body[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                tbl = np.zeros((8, 8), dtype=np.int64)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                counts = list(body[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(body[p + 17 : p + 17 + n])
                table, _ = _canonical_codes(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            names = {0xC2: "progressive", 0xC9: "arithmetic"}
            raise ValueError(
                f"unsupported JPEG process SOF{marker - 0xC0}"
                f" ({names.get(marker, 'non-baseline')})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tda = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tda >> 4, tda & 0xF))
            pos += seg_len
            return _decode_scan(
                data, pos, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no scan in JPEG")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    # per-component sample planes at their own resolution
    planes = {
        cid: np.zeros((mcus_y * 8 * cv, mcus_x * 8 * ch))
        for cid, ch, cv, _ in comps
    }
    comp_by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    br = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_index and mcu_index % dri == 0:
                # consume the restart marker, reset DC predictors
                br.align()
                p = br.pos
                if data[p] != 0xFF or not (0xD0 <= data[p + 1] <= 0xD7):
                    raise ValueError("missing expected restart marker")
                br.pos = p + 2
                pred = {cid: 0 for cid in pred}
            mcu_index += 1
            for cs, td, ta in scan:
                ch, cv, tq = comp_by_id[cs]
                for by in range(cv):
                    for bx in range(ch):
                        blk = _decode_block(
                            br, huff_dc[td], huff_ac[ta], qt[tq], pred, cs
                        )
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = blk
    # upsample to full resolution and crop
    out_planes = []
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        if ch != max_h or cv != max_v:
            p = np.repeat(np.repeat(p, max_v // cv, axis=0),
                          max_h // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return (
            np.clip(np.round(out_planes[0]), 0, 255)
            .astype(np.uint8)[:, :, None]
        )
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def _decode_block(br, dc_tbl, ac_tbl, q, pred, cid):
    coef = np.zeros(64, dtype=np.int64)
    size = _read_huffman_symbol(br, dc_tbl)
    diff = _extend(br.read_bits(size), size)
    pred[cid] += diff
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _read_huffman_symbol(br, ac_tbl)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(br.read_bits(size), size)
        k += 1
    blk = np.zeros((8, 8), dtype=np.float64)
    blk[_ZZ_ROWS, _ZZ_COLS] = coef * q[_ZZ_ROWS, _ZZ_COLS]
    return _A.T @ blk @ _A + 128.0


# ---------------------------------------------------------------------------
# encoder


def _uniform_tables():
    """Self-describing uniform-length canonical Huffman tables:
    12 DC categories at 4 bits, the 162 baseline AC symbols at
    8 bits. Valid per T.81 (prefix-free, ≤16 bits); stored in DHT so
    any conformant decoder reads them back."""
    dc_counts = [0] * 16
    dc_counts[3] = 12  # 4-bit codes
    dc_syms = list(range(12))
    ac_syms = [0x00]  # EOB
    for run in range(16):
        for size in range(1, 11):
            ac_syms.append((run << 4) | size)
    ac_syms.append(0xF0)  # ZRL
    ac_syms = sorted(set(ac_syms))
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)  # 8-bit codes
    return (dc_counts, dc_syms), (ac_counts, ac_syms)


def encode_jpeg(
    img: np.ndarray, quality: int = 100, subsampling: str = "444"
) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 → baseline
    JPEG. subsampling: '444' (default) or '420' for chroma."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError(f"unsupported channel count {c}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    q = _quant_table(quality)
    f = img.astype(np.float64)
    if c == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            comps = [(1, 2, 2, y), (2, 1, 1, _half(cb)), (3, 1, 1, _half(cr))]
        else:
            comps = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    else:
        comps = [(1, 1, 1, f[:, :, 0])]

    (dc_counts, dc_syms), (ac_counts, ac_syms) = _uniform_tables()
    _, dc_enc = _canonical_codes(dc_counts, dc_syms)
    _, ac_enc = _canonical_codes(ac_counts, ac_syms)

    out = bytearray(b"\xff\xd8")
    zz = np.zeros(64, dtype=np.int64)
    zz[:] = q[_ZZ_ROWS, _ZZ_COLS]
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(v) for v in zz
    )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, sh, sv, _ in comps:
        sof += bytes([cid, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms) in ((0, (dc_counts, dc_syms)),
                               (1, (ac_counts, ac_syms))):
        body = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    max_h = max(cc[1] for cc in comps)
    max_v = max(cc[2] for cc in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    pred = {cid: 0 for cid, *_ in comps}
    padded = {}
    for cid, sh, sv, plane in comps:
        ph, pw = mcus_y * 8 * sv, mcus_x * 8 * sh
        pp = np.empty((ph, pw))
        ch_, cw_ = plane.shape
        pp[:ch_, :cw_] = plane
        pp[ch_:, :cw_] = plane[-1:, :]  # edge-replicate padding
        pp[:, cw_:] = pp[:, cw_ - 1 : cw_]
        padded[cid] = pp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, sh, sv, _ in comps:
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[cid][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        _encode_block(
                            bw, blk, q, pred, cid, dc_enc, ac_enc
                        )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _half(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    p = np.empty((ph, pw))
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:, w:] = p[:, w - 1 : w]
    return (
        p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    )


def _encode_block(bw, blk, q, pred, cid, dc_enc, ac_enc):
    coef = _A @ blk @ _A.T
    zz = coef[_ZZ_ROWS, _ZZ_COLS]
    qd = np.round(zz / q[_ZZ_ROWS, _ZZ_COLS]).astype(np.int64)
    diff = int(qd[0]) - pred[cid]
    pred[cid] = int(qd[0])
    size = _category(diff)
    code, length = dc_enc[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    # AC run-length
    run = 0
    last_nz = 0
    nz = np.nonzero(qd[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(qd[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            bw.write(code, length)
            run -= 16
        size = _category(v)
        if size > 10:
            raise ValueError("AC coefficient magnitude out of range")
        code, length = ac_enc[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]
        bw.write(code, length)
