"""Vendored WAV / Y4M codec tests + the real audio/video decode paths.

The codecs are the library-boundary fix for the multimodal operators:
uncompressed container formats (RIFF/PCM, YUV4MPEG2) are parseable
with stdlib + numpy, so `fake=False` is a REAL decode in this
container. These tests pin the codecs bit-exactly (roundtrip under
every supported dtype/channel/colorspace combination, chunk skipping,
error paths) and the Spark operators against hand-computed numpy.
"""

import numpy as np
import pytest

from citus_spark.operators.audiocodec import decode_wav, encode_wav
from citus_spark.operators.videocodec import (
    decode_y4m_frames,
    encode_y4m,
    probe_y4m,
)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32])
@pytest.mark.parametrize("n_channels", [1, 2, 4])
def test_wav_roundtrip_bit_exact(dtype, n_channels):
    rng = np.random.default_rng(7)
    info = np.iinfo(dtype)
    s = rng.integers(info.min, int(info.max) + 1, size=(997, n_channels)).astype(
        dtype
    )
    out, rate = decode_wav(encode_wav(s, 22050))
    assert rate == 22050
    assert out.dtype == s.dtype and out.shape == s.shape
    assert (out == s).all()


def test_wav_mono_1d_input_and_odd_length_padding():
    # 8-bit mono with an odd byte count exercises the RIFF word-align
    # pad on encode and the frame-truncating divide on decode.
    s = np.arange(255, dtype=np.uint8)
    buf = encode_wav(s, 8000)
    assert len(buf) % 2 == 0
    out, rate = decode_wav(buf)
    assert out.shape == (255, 1) and (out[:, 0] == s).all()


def test_wav_skips_unknown_chunks():
    """Decoders must skip LIST/fact/etc. by declared length (RIFF
    spec) — splice a metadata chunk between fmt and data."""
    import struct

    s = np.array([[100], [-100], [3]], dtype=np.int16)
    buf = bytearray(encode_wav(s, 16000))
    data_at = buf.index(b"data")
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded odd chunk
    spliced = bytes(buf[:data_at]) + meta + bytes(buf[data_at:])
    # fix the RIFF container length
    spliced = (
        spliced[:4]
        + np.uint32(len(spliced) - 8).tobytes()
        + spliced[8:]
    )
    out, rate = decode_wav(spliced)
    assert rate == 16000 and (out == s).all()


def test_wav_error_paths():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data chunks
    buf = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
    tag_at = buf.index(b"fmt ") + 8
    buf[tag_at] = 3  # IEEE-float format tag — unsupported
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(buf))
    with pytest.raises(ValueError, match="dtype"):
        encode_wav(np.zeros(4, dtype=np.float64), 8000)


@pytest.mark.parametrize("colorspace", ["444", "420", "420jpeg", "mono"])
def test_y4m_roundtrip_bit_exact(colorspace):
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(5, 12, 16)).astype(np.uint8)
    buf = encode_y4m(frames, fps=(30, 1), colorspace=colorspace)
    dec = np.stack(list(decode_y4m_frames(buf)))
    assert (dec == frames).all()
    w, h, n, fps = probe_y4m(buf)
    assert (w, h, n, fps) == (16, 12, 5, 30.0)


def test_y4m_default_colorspace_is_420():
    """A stream header with no C tag must assume 4:2:0 per spec —
    chroma plane length follows from that."""
    frames = np.full((2, 4, 4), 9, dtype=np.uint8)
    buf = encode_y4m(frames, colorspace="420")
    stripped = buf.replace(b" C420", b"", 1)
    dec = np.stack(list(decode_y4m_frames(stripped)))
    assert (dec == frames).all()


def test_y4m_error_paths():
    with pytest.raises(ValueError, match="bad stream header"):
        list(decode_y4m_frames(b"MPEG2 W4 H4\nFRAME\n"))
    with pytest.raises(ValueError, match="colorspace"):
        list(decode_y4m_frames(b"YUV4MPEG2 W4 H4 F25:1 C422\nFRAME\n" + b"\x00" * 24))
    good = encode_y4m(np.zeros((2, 4, 4), dtype=np.uint8), colorspace="mono")
    with pytest.raises(ValueError, match="truncated"):
        list(decode_y4m_frames(good[:-3]))


def _media_df(spark, rows):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "media"]), "id long, media binary"
    )


def test_audio_features_real_matches_numpy(spark):
    """Real WAV path vs a direct numpy computation on the same PCM:
    decode, channel-0 extraction, power-of-two normalization, frame
    math, and the container's true sample rate all line up."""
    from citus_spark.operators.multimodal import audio_features

    rng = np.random.default_rng(3)
    clips = {}
    rows = []
    for i, (rate, n) in enumerate([(8000, 1000), (44100, 513), (16000, 64)]):
        pcm = rng.integers(-32768, 32768, size=(n, 2)).astype(np.int16)
        clips[i] = (pcm, rate)
        rows.append((i, encode_wav(pcm, rate)))
    out = {
        r["id"]: r
        for r in audio_features(_media_df(spark, rows), frame_len=64, fake=False)
        .collect()
    }
    for i, (pcm, rate) in clips.items():
        ch0 = pcm[:, 0].astype(np.float64) / 32768.0
        n = (len(ch0) // 64) * 64
        frames = ch0[:n].reshape(-1, 64)
        rms = np.sqrt((frames * frames).mean(axis=1))
        zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
        r = out[i]
        assert r["n_frames"] == len(frames)
        assert r["duration_s"] == len(ch0) / rate
        assert r["rms_mean"] == pytest.approx(rms.mean(), abs=0)
        assert r["rms_max"] == pytest.approx(rms.max(), abs=0)
        assert r["zcr_mean"] == pytest.approx(zcr.mean(), abs=0)


def test_frame_sample_real_y4m(spark):
    """Real Y4M path: sampled frame payloads are the exact luma planes
    at stride every_n, chroma skipped."""
    from citus_spark.operators.multimodal import frame_sample

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(9, 6, 8)).astype(np.uint8)
    rows = [(1, encode_y4m(frames, colorspace="420"))]
    out = sorted(
        frame_sample(_media_df(spark, rows), every_n=3, fake=False).collect(),
        key=lambda r: r["frame_no"],
    )
    assert [r["frame_no"] for r in out] == [0, 3, 6]
    for r in out:
        got = np.frombuffer(bytes(r["frame"]), dtype=np.uint8).reshape(6, 8)
        assert (got == frames[r["frame_no"]]).all()


# ---------------------------------------------------------------------------
# baseline JPEG (operators/jpegcodec.py, vendored from public ITU T.81)


def test_jpeg_uniform_gray_bit_exact():
    import numpy as np

    from citus_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = np.full((24, 17, 1), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(out, img)


def test_jpeg_block_uniform_gray_bit_exact_odd_dims():
    """Per-block-uniform grayscale at q100 is mathematically lossless
    (pure-DC blocks, all-ones quant table); dims off the 8-grid
    exercise MCU edge padding + crop."""
    import numpy as np

    from citus_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, size=(4, 5)).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:27, :38]
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (27, 38, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_jpeg_rgb_roundtrip_tolerance():
    import numpy as np

    from citus_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(30, 41, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == img.shape
    # q100 4:4:4: only color-transform + DCT float rounding remains
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3
    lossy = decode_jpeg(encode_jpeg(img, quality=30))
    assert lossy.shape == img.shape  # lossy but structurally sound


def test_jpeg_420_subsampling_decodes():
    import numpy as np

    from citus_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = np.full((21, 19, 3), [200, 30, 90], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    assert out.shape == (21, 19, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_rejects_non_baseline():
    import pytest

    from citus_spark.operators.jpegcodec import decode_jpeg

    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05aaa")
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_image_dispatch_sniffs_jpeg_and_png():
    import numpy as np

    from citus_spark.operators.imagecodec import (
        decode_image_bytes,
        encode_png,
    )
    from citus_spark.operators.jpegcodec import encode_jpeg

    img = np.full((16, 16, 3), 120, dtype=np.uint8)
    assert decode_image_bytes(encode_png(img)).shape == (16, 16, 3)
    assert decode_image_bytes(encode_jpeg(img)).shape == (16, 16, 3)
    import pytest

    with pytest.raises(ValueError, match="container"):
        decode_image_bytes(b"BM......bitmap-not-supported")


def test_decode_image_real_path_handles_jpeg(spark):
    """The production decode_image(fake=False) must dispatch JPEG
    payloads, not NULL them."""
    import numpy as np

    from citus_spark.operators.jpegcodec import encode_jpeg
    from citus_spark.operators.multimodal import decode_image

    img = np.full((12, 20, 3), 64, dtype=np.uint8)
    blob = encode_jpeg(img, quality=90)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, media binary")
    row = decode_image(df, fake=False).collect()[0]
    assert (row.width, row.height, row.channels) == (20, 12, 3)


# ---------------------------------------------------------------------------
# GIF (operators/gifcodec.py, vendored from the public GIF89a spec)


def test_gif_roundtrip_all_width_regimes():
    """Palette sizes and pixel counts chosen to push LZW code width
    from 3 bits through 12 bits with dictionary resets."""
    import numpy as np

    from citus_spark.operators.gifcodec import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    for (h, w, n_pal) in [(5, 7, 4), (40, 60, 256), (64, 64, 2),
                          (300, 300, 256)]:
        pal = rng.integers(0, 256, size=(n_pal, 3)).astype(np.uint8)
        idx = rng.integers(0, n_pal, size=(h, w)).astype(np.uint8)
        out = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(out, pal[idx]), (h, w, n_pal)


def test_gif_interlaced_roundtrip():
    import numpy as np

    from citus_spark.operators.gifcodec import decode_gif, encode_gif

    rng = np.random.default_rng(9)
    idx = rng.integers(0, 16, size=(37, 23)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    out = decode_gif(encode_gif(idx, pal, interlace=True))
    assert np.array_equal(out, pal[idx])


def test_gif_decodes_foreign_real_world_files():
    """Conformance against files produced by OTHER encoders (shipped
    with system packages) — catches LZW width-growth desync that a
    same-codec roundtrip can hide."""
    import glob
    import os

    import pytest

    from citus_spark.operators.gifcodec import decode_gif

    files = sorted(glob.glob("/usr/share/doc/*/html/*.gif"))[:6]
    if not files:
        pytest.skip("no system GIFs on this machine")
    for f in files:
        arr = decode_gif(open(f, "rb").read())
        assert arr.ndim == 3 and arr.shape[2] == 3 and arr.size > 0


def test_gif_rejections():
    import numpy as np
    import pytest

    from citus_spark.operators.gifcodec import decode_gif, encode_gif

    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF89a")
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="index out of range"):
        encode_gif(np.full((4, 4), 9, dtype=np.uint8), pal)


def test_dispatch_sniffs_gif():
    import numpy as np

    from citus_spark.operators.gifcodec import encode_gif
    from citus_spark.operators.imagecodec import decode_image_bytes

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.eye(8, dtype=np.uint8)
    assert decode_image_bytes(encode_gif(idx, pal)).shape == (8, 8, 3)
