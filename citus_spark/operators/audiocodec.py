"""Minimal pure-Python WAV (RIFF/PCM) codec — stdlib struct + numpy.

Vendored so the multimodal audio operators have a REAL decode path in
environments without soundfile/librosa (this container): supports the
common core of the format — canonical RIFF/WAVE containers with a
PCM (format tag 1) `fmt ` chunk and 8/16/32-bit integer samples, any
channel count and sample rate. Unknown chunks (LIST, fact, cue, ...)
are skipped by their declared length, as the RIFF spec requires.
Anything outside that core raises ValueError with the unsupported
field named.

Like imagecodec, this is deliberately a *codec*, not a DSP library:
decode to an (n_samples, n_channels) int array + sample rate, encode
back. Feature extraction over the arrays (RMS/ZCR/duration) is plain
numpy in operators/multimodal.py.

Reference parity note: citus has no media codecs at all (extension
surface per SURVEY §2); this exists so the training-data-pipeline
operators are real, not stubbed, in this container.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_samples, n_channels) int array, sample_rate).

    8-bit audio is unsigned per the WAV spec and is returned as uint8;
    16/32-bit are signed little-endian.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            pcm = body
            # fmt is required to precede data per spec; keep scanning
            # anyway in case of trailing metadata chunks.
    if fmt is None:
        raise ValueError("not a WAV: missing fmt chunk")
    if pcm is None:
        raise ValueError("not a WAV: missing data chunk")
    tag, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if bits not in _DTYPES:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if n_channels < 1:
        raise ValueError("WAV channel count must be >= 1")
    dtype = _DTYPES[bits]
    width = bits // 8
    n_frames = len(pcm) // (width * n_channels)
    samples = np.frombuffer(
        pcm[: n_frames * width * n_channels], dtype=dtype
    ).reshape(n_frames, n_channels)
    return samples, sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_samples,) or (n_samples, n_channels) int array → WAV bytes.

    dtype picks the bit depth: uint8 → 8-bit, int16 → 16-bit,
    int32 → 32-bit.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("samples must be 1-D or (n_samples, n_channels)")
    if samples.dtype == np.uint8:
        bits = 8
    elif samples.dtype == np.int16:
        bits = 16
    elif samples.dtype == np.int32:
        bits = 32
    else:
        raise ValueError(f"unsupported sample dtype {samples.dtype}")
    n_channels = samples.shape[1]
    width = bits // 8
    pcm = np.ascontiguousarray(samples.astype(samples.dtype.newbyteorder("<"))).tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,
        n_channels,
        sample_rate,
        sample_rate * n_channels * width,
        n_channels * width,
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
