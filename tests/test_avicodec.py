"""MJPEG-AVI container codec (operators/avicodec.py) and the
format-sniffing video dispatch (videocodec.decode_video_frames)."""

import numpy as np
import pytest

from citus_spark.operators.avicodec import (
    decode_avi_frames,
    encode_avi_mjpeg,
    probe_avi,
)
from citus_spark.operators.videocodec import (
    decode_video_frames,
    encode_y4m,
    probe_video,
)


def _const_frames(n=4, h=16, w=16, base=10, step=37):
    lumas = (base + np.arange(n) * step) % 256
    return np.broadcast_to(
        lumas.astype(np.uint8)[:, None, None], (n, h, w)
    ).copy()


def test_mjpeg_roundtrip_bit_exact_uniform_frames():
    frames = _const_frames()
    dec = list(decode_avi_frames(encode_avi_mjpeg(frames, fps=(30, 1))))
    assert len(dec) == 4
    for i, d in enumerate(dec):
        assert np.array_equal(d, frames[i])


def test_mjpeg_gradient_frames_close():
    # non-uniform content is lossy-but-close at q100
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(3, 24, 24)).astype(np.uint8)
    dec = list(decode_avi_frames(encode_avi_mjpeg(frames)))
    for i, d in enumerate(dec):
        assert d.shape == (24, 24)
        err = np.abs(d.astype(np.int64) - frames[i].astype(np.int64))
        assert err.mean() < 8


def test_probe():
    frames = _const_frames(n=7, h=8, w=12)
    w, h, n, fps = probe_avi(encode_avi_mjpeg(frames, fps=(24, 1)))
    assert (w, h, n, fps) == (12, 8, 7, 24.0)


def test_rejects_non_mjpg_compression():
    avi = encode_avi_mjpeg(_const_frames())
    with pytest.raises(ValueError, match="H264"):
        list(decode_avi_frames(avi.replace(b"MJPG", b"H264")))


def test_rejects_non_avi():
    with pytest.raises(ValueError):
        list(decode_avi_frames(b"RIFF\x00\x00\x00\x00WAVE"))


def test_dispatch_sniffs_both_formats():
    frames = _const_frames(n=3)
    for blob in (
        encode_avi_mjpeg(frames),
        encode_y4m(frames, colorspace="444"),
    ):
        dec = list(decode_video_frames(blob))
        assert len(dec) == 3
        assert all(np.array_equal(d, f) for d, f in zip(dec, frames))
        w, h, n, _fps = probe_video(blob)
        assert (w, h, n) == (16, 16, 3)
    with pytest.raises(ValueError):
        list(decode_video_frames(b"\x00\x01\x02"))
