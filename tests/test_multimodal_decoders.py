"""Real stdlib media decoders: WAV (wave/struct) and 24-bit BMP (struct)
— round-trips and feature properties, no Spark needed."""

import pytest

from morph_xr2rml_spark.ops.multimodal import (bmp_feature, decode_bmp,
                                               decode_image, decode_wav,
                                               fake_feature, make_bmp,
                                               make_wav, wav_feature)


def test_wav_roundtrip():
    payload = make_wav(seed=5, sample_rate=8000, n_samples=400)
    d = decode_wav(payload)
    assert d["sample_rate"] == 8000
    assert d["n_channels"] == 1
    assert d["n_frames"] == 400
    assert d["duration_ms"] == 50
    assert len(d["samples"]) == 400
    # a sine has symmetric positive/negative halves
    assert min(d["samples"]) < 0 < max(d["samples"])


def test_wav_feature_properties():
    f = wav_feature(make_wav(seed=3))
    assert len(f) == 9                       # 8 RMS windows + ZCR
    assert all(0.0 <= x <= 1.0 for x in f)
    # different seed (freq/amp) → different feature
    assert f != wav_feature(make_wav(seed=0))
    # deterministic
    assert wav_feature(make_wav(seed=3)) == f


def test_bmp_roundtrip():
    payload = make_bmp(seed=7, width=10, height=6)
    w, h, px = decode_bmp(payload)
    assert (w, h) == (10, 6)
    assert len(px) == 60
    # check one pixel against the generator formula
    x, y = 3, 2
    assert px[y * w + x] == ((x * 13 + 7 * 7) % 256,
                             (y * 29 + 7 * 11) % 256,
                             ((x + y) * 31 + 7 * 3) % 256)


def test_bmp_feature_grid():
    f = bmp_feature(make_bmp(seed=1), grid=4)
    assert len(f) == 48
    assert all(0.0 <= x <= 1.0 for x in f)
    # decode_image dispatches BMP natively
    w, h, _ = decode_image(make_bmp(seed=1))
    assert (w, h) == (16, 16)


def test_codec_formats_stay_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0jpeg...")
    assert len(fake_feature(b"anything")) == 16
