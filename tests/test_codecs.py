"""Codec kernel unit tests (SURVEY.md §5.1): hand-computable
round-trips per format and PNG filter type, corruption handling."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_check_spark.kernels import codecs as C

RNG = np.random.default_rng(123)


def _img(h=13, w=17):
    return RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "ppm", "png"])
def test_roundtrip(fmt):
    for h, w in [(8, 8), (13, 17), (64, 64), (9, 31)]:
        pix = _img(h, w)
        assert (C.decode(C.encode(pix, fmt), fmt, w, h) == pix).all()


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_filter_types(ft):
    pix = _img(11, 23)
    assert (C.decode_png(C.encode_png(pix, filter_mode=ft)) == pix).all()


def test_truncated_raises():
    pix = _img()
    for fmt in ("raw", "ppm", "png"):
        enc = C.encode(pix, fmt)
        with pytest.raises(ValueError):
            C.decode(enc[: len(enc) // 2], fmt, 17, 13)


def test_bad_signature_raises():
    with pytest.raises(ValueError):
        C.decode_png(b"nope" * 10)
    with pytest.raises(ValueError):
        C.decode_ppm(b"P3\n1 1\n255\nxxx")


def test_ahash_deterministic_and_discriminative():
    a = _img(32, 32)
    assert C.ahash64(a) == C.ahash64(a.copy())
    b = a.copy()
    b[:16] = 255 - b[:16]
    assert C.ahash64(a) != C.ahash64(b)
    assert isinstance(C.ahash64(a), int)
    # signed-int64 range
    assert -(1 << 63) <= C.ahash64(a) < (1 << 63)


def test_psnr():
    a = _img()
    assert C.psnr_db(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = (int(b[0, 0, 0]) + 128) % 256
    assert 0 < C.psnr_db(a, b) < 100
