"""IMA/DVI ADPCM codec (operators/audiocodec.py, WAVE tag 0x11).

External conformance: the core step arithmetic is compared bit-exact
against stdlib audioop's Intel/DVI ADPCM implementation (an
independent C implementation of the same public spec). Container
tests cover block boundaries, stereo interleave, fact-chunk trimming,
and roundtrip SNR.
"""

import numpy as np
import pytest

from citus_spark.operators.audiocodec import (
    decode_wav,
    encode_wav_ima_adpcm,
    ima_decode_nibbles,
)


def _sig(n=8000, ch=1, seed=3):
    t = np.arange(n)
    base = (
        6000 * np.sin(2 * np.pi * 220 * t / 8000)
        + 2000 * np.sin(2 * np.pi * 721 * t / 8000)
    ).astype(np.int16)
    if ch == 1:
        return base
    return np.stack([base, (base // 2).astype(np.int16)], axis=1)


def test_audioop_conformance_step_arithmetic():
    audioop = pytest.importorskip("audioop")
    nibs = [(i * 7 + 3) % 16 for i in range(256)]
    ours, _, _ = ima_decode_nibbles(nibs, 0, 0)
    packed = bytes(
        ((nibs[i] & 0xF) << 4) | (nibs[i + 1] & 0xF)
        for i in range(0, len(nibs), 2)
    )
    theirs = np.frombuffer(
        audioop.adpcm2lin(packed, 2, (0, 0))[0], dtype="<i2"
    )
    assert np.array_equal(ours, theirs)


def test_roundtrip_snr_mono_and_stereo():
    for ch in (1, 2):
        sig = _sig(ch=ch)
        dec, rate = decode_wav(encode_wav_ima_adpcm(sig, 8000))
        sig2 = sig if sig.ndim == 2 else sig[:, None]
        assert rate == 8000 and dec.shape == sig2.shape
        err = dec.astype(np.float64) - sig2
        snr = 10 * np.log10(
            (sig2.astype(np.float64) ** 2).mean() / (err ** 2).mean()
        )
        assert snr > 25, f"ch={ch} SNR {snr:.1f} dB"


def test_stereo_channels_stay_separate():
    # silent right channel must decode near-silent (interleave bugs
    # bleed the left square wave into it)
    left = np.where(np.arange(4096) % 2 == 0, 12000, -12000)
    sig = np.stack([left, np.zeros(4096, dtype=np.int64)], 1).astype(
        np.int16
    )
    dec, _ = decode_wav(encode_wav_ima_adpcm(sig, 8000))
    assert np.abs(dec[:, 1].astype(np.int64)).max() < 256
    assert np.abs(dec[:, 0].astype(np.int64)).mean() > 8000


def test_fact_chunk_trims_block_padding():
    # 300 frames with spb=129 → 3 blocks = 387 slots; fact says 300
    sig = _sig(n=300)
    wav = encode_wav_ima_adpcm(sig, 8000, block_align=68)
    dec, _ = decode_wav(wav)
    assert dec.shape == (300, 1)


def test_block_boundary_state_continuity():
    # a ramp crossing many blocks must not glitch at block edges:
    # each block header restarts the predictor at the true sample
    ramp = np.linspace(-20000, 20000, 2000).astype(np.int16)
    dec, _ = decode_wav(encode_wav_ima_adpcm(ramp, 8000, block_align=68))
    err = np.abs(dec[:, 0].astype(np.int64) - ramp.astype(np.int64))
    assert err.max() < 512


def test_rejects_bad_align_and_depth():
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(_sig(n=100), 8000, block_align=6)
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(
            _sig(n=100).astype(np.int32), 8000
        )
