"""Minimal pure-Python GIF codec — stdlib + numpy only.

Vendored from the public GIF89a specification (CompuServe, 1990; the
format is public domain) so the multimodal operators can decode the
third common real-world image format beside PNG (imagecodec.py) and
baseline JPEG (jpegcodec.py).

DECODE: GIF87a/GIF89a, global and local color tables, variable-width
LZW with dictionary resets, interlaced and non-interlaced images,
extension blocks skipped. Returns the FIRST image as (h, w, 3) uint8
RGB (animation frames beyond the first are out of scope and ignored;
transparency is ignored — the pixel takes its palette color).

ENCODE: palette-based single-image GIF89a. Pixels are palette
indices; LZW output uses the spec's clear-code reset idiom with a
growing dictionary (a conformant, moderately compressing encoder).
`interlace=True` writes the four-pass row order, so the decoder's
deinterlacer is testable without external samples.
"""

from __future__ import annotations

import struct

import numpy as np


def _color_table(data: bytes, pos: int, size_field: int):
    n = 2 << size_field  # 2^(field+1) entries
    tbl = np.frombuffer(
        data, dtype=np.uint8, count=3 * n, offset=pos
    ).reshape(n, 3)
    return tbl, pos + 3 * n


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    dict_entries: list[bytes] = []

    def reset_dict():
        nonlocal dict_entries, code_size
        dict_entries = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1

    reset_dict()
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            reset_dict()
            prev = None
            continue
        if code == end:
            break
        if code < len(dict_entries):
            entry = dict_entries[code]
        elif code == len(dict_entries) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF: invalid LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(
            entry, dtype=np.uint8, count=take
        )
        n_out += take
        if prev is not None and len(dict_entries) < 4096:
            dict_entries.append(prev + entry[:1])
            if (
                len(dict_entries) == (1 << code_size)
                and code_size < 12
            ):
                code_size += 1
        prev = entry
        if n_out >= n_pixels:
            break
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → first image as (h, w, 3) uint8 RGB."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF: bad signature")
    _w, _h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(data, pos, flags & 0x07)
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02X}")
        # image descriptor
        _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        table = gct
        if iflags & 0x80:
            table, pos = _color_table(data, pos, iflags & 0x07)
        if table is None:
            raise ValueError("GIF: image without a color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code_size, bytes(lzw), iw * ih).reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        return table[idx]
    raise ValueError("GIF: no image block")


class _LzwEncoder:
    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.clear = 1 << min_code_size
        self.end = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self._reset()

    def _reset(self) -> None:
        self.table: dict[bytes, int] = {
            bytes([i]): i for i in range(self.clear)
        }
        self.next_code = self.end + 1
        self.code_size = self.min + 1

    def _emit(self, code: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += self.code_size
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def encode(self, pixels: np.ndarray) -> bytes:
        self._emit(self.clear)
        run = b""
        for p in pixels.tobytes():
            cand = run + bytes([p])
            if cand in self.table:
                run = cand
                continue
            self._emit(self.table[run])
            if self.next_code < 4096:
                self.table[cand] = self.next_code
                # the encoder grows its code width when the NEXT code
                # would not fit (decoder mirrors this)
                if self.next_code == (1 << self.code_size):
                    self.code_size += 1
                self.next_code += 1
            else:
                self._emit(self.clear)
                self._reset()
            run = bytes([p])
        if run:
            self._emit(self.table[run])
        self._emit(self.end)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → GIF89a
    bytes (single image)."""
    h, w = indices.shape
    n = len(palette)
    if n < 2 or n > 256:
        raise ValueError(f"palette size {n} not in 2..256")
    if indices.max() >= n:
        raise ValueError("palette index out of range")
    size_field = max(1, (int(n - 1)).bit_length()) - 1
    table_n = 2 << size_field
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field << 4) | size_field,
                       0, 0)
    out += pal.tobytes()
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    rows = indices
    if interlace:
        order = [
            y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
        ]
        rows = indices[order]
    min_code_size = max(2, size_field + 1)
    out.append(min_code_size)
    stream = _LzwEncoder(min_code_size).encode(
        np.ascontiguousarray(rows, dtype=np.uint8)
    )
    for off in range(0, len(stream), 255):
        chunk = stream[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
