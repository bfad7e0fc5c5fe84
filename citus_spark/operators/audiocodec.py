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
    fact_frames = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"fact" and length >= 4:
            (fact_frames,) = struct.unpack("<I", body[:4])
        elif ctype == b"data":
            pcm = body
            # fmt is required to precede data per spec; keep scanning
            # anyway in case of trailing metadata chunks.
    if fmt is None:
        raise ValueError("not a WAV: missing fmt chunk")
    if pcm is None:
        raise ValueError("not a WAV: missing data chunk")
    tag, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if tag == 0x11:  # IMA/DVI ADPCM — compressed path
        if n_channels < 1:
            raise ValueError("WAV channel count must be >= 1")
        if bits != 4:
            raise ValueError(f"IMA-ADPCM bit depth must be 4, got {bits}")
        samples = decode_ima_adpcm(pcm, n_channels, _align, fact_frames)
        return samples, sample_rate
    if tag != 1:
        raise ValueError(
            f"unsupported WAV format tag {tag} (PCM + IMA-ADPCM only)"
        )
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


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (WAVE format tag 0x0011) — the first COMPRESSED
# audio format with a real decode path here. Public spec: IMA
# "Recommended Practices for Enhancing Digital Audio Compatibility"
# (rev 3.00, 1992) + the Microsoft WAVE IMA-ADPCM block layout.
#
# Block layout (wFormatTag = 0x11): every nBlockAlign-byte block
# starts with a 4-byte header PER CHANNEL (int16 predictor — which IS
# output sample 0 of the block — uint8 step index, reserved byte),
# then nibble data in 4-byte groups per channel (8 samples, low
# nibble first), channels interleaved group-wise. 4 bits/sample ≈ 4×
# compression over 16-bit PCM.

_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)

_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32,
)


def ima_decode_nibbles(
    nibbles, predictor: int, index: int
) -> tuple[np.ndarray, int, int]:
    """Core IMA step arithmetic: nibble stream + (predictor, index)
    state → int16 samples + final state. Exactly the spec's decoder:

        diff = step>>3 (+ step>>2 if b0) (+ step>>1 if b1) (+ step if b2)
        negated if b3; predictor clamps to int16; index steps by the
        index table and clamps to [0, 88].
    """
    out = np.empty(len(nibbles), dtype=np.int16)
    for i, nb in enumerate(nibbles):
        step = int(_IMA_STEP_TABLE[index])
        diff = step >> 3
        if nb & 1:
            diff += step >> 2
        if nb & 2:
            diff += step >> 1
        if nb & 4:
            diff += step
        if nb & 8:
            diff = -diff
        predictor = min(32767, max(-32768, predictor + diff))
        index = min(88, max(0, index + int(_IMA_INDEX_TABLE[nb])))
        out[i] = predictor
    return out, predictor, index


def _ima_encode_block(
    samples: np.ndarray, index: int
) -> tuple[bytes, bytes, int]:
    """One channel-block: samples[0] becomes the header predictor;
    the rest quantize to nibbles. Returns (header, nibble_bytes,
    final_index)."""
    predictor = int(samples[0])
    header = struct.pack("<hBB", predictor, index, 0)
    nibbles = []
    for s in samples[1:]:
        step = int(_IMA_STEP_TABLE[index])
        diff = int(s) - predictor
        nb = 0
        if diff < 0:
            nb = 8
            diff = -diff
        if diff >= step:
            nb |= 4
            diff -= step
        if diff >= step >> 1:
            nb |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nb |= 1
        # reconstruct exactly as the decoder will, to keep the
        # predictor in lock-step
        dec, predictor, index = ima_decode_nibbles([nb], predictor, index)
        nibbles.append(nb)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
        for i in range(0, len(nibbles), 2)
    )
    return header, packed, index


def decode_ima_adpcm(
    body: bytes, n_channels: int, block_align: int, n_frames: int | None
) -> np.ndarray:
    """WAVE IMA-ADPCM data chunk → (n_frames, n_channels) int16."""
    if block_align <= 4 * n_channels or block_align % 4:
        raise ValueError(f"bad IMA-ADPCM block align {block_align}")
    spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
    chans: list[list[np.ndarray]] = [[] for _ in range(n_channels)]
    for off in range(0, len(body) - (4 * n_channels) + 1, block_align):
        block = body[off : off + block_align]
        states = []
        for ch in range(n_channels):
            pred, idx, _res = struct.unpack(
                "<hBB", block[4 * ch : 4 * ch + 4]
            )
            if idx > 88:
                raise ValueError(f"IMA-ADPCM step index {idx} out of range")
            chans[ch].append(np.array([pred], dtype=np.int16))
            states.append((pred, idx))
        data = np.frombuffer(block[4 * n_channels :], dtype=np.uint8)
        # 4-byte groups rotate across channels; low nibble first
        n_groups = len(data) // 4
        if n_groups:
            groups = data[: n_groups * 4].reshape(n_groups, 4)
            for ch in range(n_channels):
                mine = groups[ch::n_channels].reshape(-1)
                nibs = np.empty(mine.size * 2, dtype=np.uint8)
                nibs[0::2] = mine & 0xF
                nibs[1::2] = mine >> 4
                pred, idx = states[ch]
                dec, pred, idx = ima_decode_nibbles(nibs, pred, idx)
                chans[ch].append(dec[: spb - 1])
    out = np.stack(
        [np.concatenate(c) if c else np.empty(0, np.int16) for c in chans],
        axis=1,
    )
    if n_frames is not None:
        out = out[:n_frames]
    return out


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 256
) -> bytes:
    """(n,) or (n, ch) int16 → WAVE IMA-ADPCM bytes (fact chunk
    carries the true frame count so decode trims block padding)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("IMA-ADPCM encodes int16 samples")
    n_frames, n_channels = samples.shape
    if block_align <= 4 * n_channels or block_align % 4:
        raise ValueError(f"bad IMA-ADPCM block align {block_align}")
    spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
    indices = [0] * n_channels
    blocks = []
    for start in range(0, n_frames, spb):
        chunk = samples[start : start + spb]
        if chunk.shape[0] < spb:  # pad the tail block
            chunk = np.vstack(
                [chunk, np.repeat(chunk[-1:], spb - chunk.shape[0], axis=0)]
            )
        headers, payloads = [], []
        for ch in range(n_channels):
            header, packed, indices[ch] = _ima_encode_block(
                chunk[:, ch], indices[ch]
            )
            headers.append(header)
            payloads.append(packed)
        # interleave payloads in 4-byte groups per channel
        body = b"".join(headers)
        n_groups = len(payloads[0]) // 4
        for g in range(n_groups):
            for ch in range(n_channels):
                body += payloads[ch][4 * g : 4 * g + 4]
        blocks.append(body)
    data = b"".join(blocks)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11,
        n_channels,
        sample_rate,
        byte_rate,
        block_align,
        4,  # bits per sample
        2,  # cbSize
        spb,  # wSamplesPerBlock
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n_frames)
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
