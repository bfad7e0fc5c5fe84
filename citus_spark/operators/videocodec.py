"""Minimal pure-Python Y4M (YUV4MPEG2) codec — stdlib + numpy.

Vendored so the multimodal video operators have a REAL decode path in
environments without pyav/ffmpeg (this container). Y4M is ffmpeg's
uncompressed interchange format: an ASCII stream header
(`YUV4MPEG2 W<w> H<h> F<num>:<den> ... [C<colorspace>]`) followed by
`FRAME\\n`-delimited raw planar frames — simple enough to parse
exactly, which is the point: the operator pipeline (frame iteration,
sampling stride, per-frame reduction) is identical to what a real
compressed-video path would run after its codec stage.

Supported colorspaces: C444 (full-res U/V), C420 family (half-res
U/V, any of C420/C420jpeg/C420paldv/C420mpeg2), and Cmono (luma
only). Anything else raises ValueError naming the field.

Decode yields (h, w) uint8 LUMA planes per frame — downstream
operators (frame sampling, per-frame stats, perceptual hashing) are
luma-based, and returning Y directly avoids materializing chroma the
caller would drop.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

_CHROMA_DIV = {  # colorspace → (u/v width divisor, u/v height divisor)
    "444": (1, 1),
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420paldv": (2, 2),
    "420mpeg2": (2, 2),
    "mono": None,
}


def _parse_header(data: bytes) -> tuple[int, int, str, tuple[int, int], int]:
    """→ (width, height, colorspace, (fps_num, fps_den), header_end)."""
    end = data.find(b"\n")
    if end < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M: bad stream header")
    w = h = None
    fps = (25, 1)
    colorspace = "420"  # Y4M default per spec
    for tok in data[9:end].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == "C":
            colorspace = val
        # I (interlacing), A (aspect), X (metadata) are irrelevant to
        # plane layout; skip.
    if w is None or h is None:
        raise ValueError("not a Y4M: missing W/H in stream header")
    if colorspace not in _CHROMA_DIV:
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    return w, h, colorspace, fps, end + 1


def decode_y4m_frames(data: bytes) -> Iterator[np.ndarray]:
    """Y4M bytes → iterator of (h, w) uint8 luma planes."""
    w, h, colorspace, _fps, pos = _parse_header(data)
    div = _CHROMA_DIV[colorspace]
    y_len = w * h
    uv_len = 0 if div is None else 2 * ((w // div[0]) * (h // div[1]))
    while pos < len(data):
        nl = data.find(b"\n", pos)
        if nl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M: bad FRAME marker")
        pos = nl + 1
        if pos + y_len > len(data):
            raise ValueError("Y4M: truncated frame")
        yield np.frombuffer(data[pos : pos + y_len], dtype=np.uint8).reshape(h, w)
        pos += y_len + uv_len


def probe_y4m(data: bytes) -> tuple[int, int, int, float]:
    """Y4M bytes → (width, height, n_frames, fps) without copying planes."""
    w, h, colorspace, fps, pos = _parse_header(data)
    div = _CHROMA_DIV[colorspace]
    frame_len = w * h + (0 if div is None else 2 * ((w // div[0]) * (h // div[1])))
    n = 0
    while pos < len(data):
        nl = data.find(b"\n", pos)
        if nl < 0:
            raise ValueError("Y4M: bad FRAME marker")
        pos = nl + 1 + frame_len
        n += 1
    if pos > len(data):
        raise ValueError("Y4M: truncated frame")
    return w, h, n, fps[0] / fps[1]


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), colorspace: str = "444"
) -> bytes:
    """(n, h, w) uint8 luma planes → Y4M bytes.

    Chroma planes are written neutral (128) at the declared
    subsampling — callers here operate on luma only.
    """
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w) uint8")
    div = _CHROMA_DIV.get(colorspace)
    if colorspace not in _CHROMA_DIV:
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    n, h, w = frames.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1"
    if colorspace != "mono":
        header += f" C{colorspace}"
    else:
        header += " Cmono"
    out = bytearray(header.encode("ascii") + b"\n")
    uv = (
        b""
        if div is None
        else bytes([128]) * (2 * ((w // div[0]) * (h // div[1])))
    )
    for i in range(n):
        out += b"FRAME\n"
        out += np.ascontiguousarray(frames[i]).tobytes()
        out += uv
    return bytes(out)


def decode_video_frames(data: bytes) -> Iterator[np.ndarray]:
    """Format-sniffing video decode: Y4M (uncompressed) or MJPEG AVI
    (compressed, operators/avicodec.py) → (h, w) uint8 luma planes.
    The dispatch mirrors imagecodec.decode_image_bytes' signature
    sniffing, so frame operators stay format-agnostic."""
    if data[:9] == b"YUV4MPEG2":
        yield from decode_y4m_frames(data)
        return
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from citus_spark.operators.avicodec import decode_avi_frames

        yield from decode_avi_frames(data)
        return
    raise ValueError(
        "unsupported video container (Y4M and MJPEG AVI only; other "
        "formats need ffmpeg/pyav, absent in this container)"
    )


def probe_video(data: bytes) -> tuple[int, int, int, float]:
    """Format-sniffing probe → (width, height, n_frames, fps)."""
    if data[:9] == b"YUV4MPEG2":
        return probe_y4m(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from citus_spark.operators.avicodec import probe_avi

        return probe_avi(data)
    raise ValueError("unsupported video container (Y4M and MJPEG AVI only)")
