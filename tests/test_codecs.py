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


@pytest.mark.parametrize("version,max_err", [(1, 3), (2, 63)])
def test_rawq_quantization_bounds(version, max_err):
    """Lossy round-trip: production decode is within the quantization
    step of the original and deterministic."""
    pix = _img(13, 17)
    blob = C.encode_rawq(pix, version)
    dec = C.decode_rawq(blob, 17, 13)
    assert dec.shape == pix.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - pix.astype(int)).max() <= max_err
    assert (C.decode(blob, "rawq", 17, 13) == dec).all()


def test_rawq_psnr_threshold_branch():
    """The PSNR fidelity measure: v1 (6-bit) decoder pair agrees above
    the 40 dB keep threshold, v2 (2-bit) falls far below — the branch
    BASELINE.json:15 specifies for lossy formats, finite on both
    sides."""
    from data_quality_check_spark.constants import MIN_PSNR_DB

    pix = _img(32, 32)
    b1, b2 = C.encode_rawq(pix, 1), C.encode_rawq(pix, 2)
    p1 = C.psnr_db(C.decode_rawq(b1, 32, 32), C.decode_rawq_ref(b1, 32, 32))
    p2 = C.psnr_db(C.decode_rawq(b2, 32, 32), C.decode_rawq_ref(b2, 32, 32))
    assert np.isfinite(p1) and np.isfinite(p2)
    assert p1 >= MIN_PSNR_DB > p2


def test_rawq_corruption_raises():
    pix = _img(8, 8)
    blob = C.encode_rawq(pix, 1)
    with pytest.raises(ValueError):
        C.decode_rawq(blob[: len(blob) // 2], 8, 8)   # truncated
    with pytest.raises(ValueError):
        C.decode_rawq(b"XX" + blob[2:], 8, 8)         # bad magic
    with pytest.raises(ValueError):
        C.decode_rawq(blob[:2] + b"\x07" + blob[3:], 8, 8)  # bad version


def test_decode_ref_none_for_lossless():
    pix = _img(8, 8)
    for fmt in ("raw", "ppm", "png"):
        assert C.decode_ref(C.encode(pix, fmt), fmt, 8, 8) is None
