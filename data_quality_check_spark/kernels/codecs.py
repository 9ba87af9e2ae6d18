"""Image codecs + perceptual hash, pure numpy / stdlib (no PIL in the
sandbox).  Supports the three lossless sandbox formats of the `images`
table (BASELINE.json:15 fmt column): ``raw`` (packed RGB), ``ppm``
(P6), ``png`` (zlib + filters 0-4, 8-bit RGB) — plus ``rawq``, a
LOSSY quantized-raw format that exercises the PSNR >= 40 dB branch of
the pixel invariant (BASELINE.json:15) with finite values: the
production decoder (mid-rise dequantization) and the independent
reference decoder (linear-scale dequantization) legitimately disagree,
modeling decoder drift on real lossy formats.  rawq version 1 (6-bit)
stays above the threshold (~47 dB); version 2 (2-bit) falls far below
(~19 dB) and is dropped as pixel_invalid.

Used by BOTH the synthetic generator (encode side) and the pipeline's
decode-invariant UDF (decode side) — SURVEY.md §2 O-3 / O-13.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# raw
# ---------------------------------------------------------------------------

def encode_raw(pix: np.ndarray) -> bytes:
    """pix: (h, w, 3) uint8 -> packed row-major RGB bytes."""
    return pix.astype(np.uint8, copy=False).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    expect = w * h * 3
    if len(data) != expect:
        raise ValueError(f"raw payload {len(data)}B != {expect}B for {w}x{h}")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# ppm (P6, maxval 255)
# ---------------------------------------------------------------------------

def encode_ppm(pix: np.ndarray) -> bytes:
    h, w = pix.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pix.astype(np.uint8, copy=False).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    # header: magic, whitespace, w, h, maxval, single whitespace, pixels
    parts = []
    i = 2
    while len(parts) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":  # comment line
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated ppm header")
        parts.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported ppm maxval {maxval}")
    body = data[i : i + w * h * 3]
    if len(body) != w * h * 3:
        raise ValueError("truncated ppm body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# rawq (lossy): b"RQ" + version byte + one quantized sample per byte.
# version 1: 6-bit (q = p >> 2), version 2: 2-bit (q = p >> 6).
# ---------------------------------------------------------------------------

RAWQ_MAGIC = b"RQ"
_RAWQ_SHIFT = {1: 2, 2: 6}


def encode_rawq(pix: np.ndarray, version: int = 1) -> bytes:
    shift = _RAWQ_SHIFT[version]
    q = (pix.astype(np.uint8, copy=False) >> shift)
    return RAWQ_MAGIC + bytes([version]) + q.tobytes()


def _rawq_payload(data: bytes, w: int, h: int) -> tuple[int, np.ndarray]:
    if len(data) < 3 or data[:2] != RAWQ_MAGIC:
        raise ValueError("bad rawq magic")
    version = data[2]
    if version not in _RAWQ_SHIFT:
        raise ValueError(f"unsupported rawq version {version}")
    body = data[3:]
    expect = w * h * 3
    if len(body) != expect:
        raise ValueError(f"rawq payload {len(body)}B != {expect}B for {w}x{h}")
    return version, np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def decode_rawq(data: bytes, w: int, h: int) -> np.ndarray:
    """Production dequantization: mid-rise (q * step + step/2, capped
    at 255)."""
    version, q = _rawq_payload(data, w, h)
    shift = _RAWQ_SHIFT[version]
    step = 1 << shift
    return np.minimum(q.astype(np.int32) * step + step // 2, 255).astype(np.uint8)


def decode_rawq_ref(data: bytes, w: int, h: int) -> np.ndarray:
    """Independent reference dequantization: linear scale to [0, 255]
    (round(q * 255 / qmax)).  Deliberately a different convention from
    decode_rawq — their PSNR is the decoder-fidelity measure the
    pixel invariant thresholds at MIN_PSNR_DB."""
    version, q = _rawq_payload(data, w, h)
    qmax = (1 << (8 - _RAWQ_SHIFT[version])) - 1
    return np.rint(q.astype(np.float64) * (255.0 / qmax)).astype(np.uint8)


# ---------------------------------------------------------------------------
# png (8-bit RGB, colour type 2, filters 0-4 incl. Paeth)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (int16 inputs)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def encode_png(pix: np.ndarray, filter_mode: int = -1, level: int = 1) -> bytes:
    """Encode (h, w, 3) uint8 as PNG.

    filter_mode: -1 => filter type cycles (row % 5) to exercise every
    de-filter path in round-trip tests; 0..4 => fixed type.
    """
    h, w = pix.shape[:2]
    pix = pix.astype(np.uint8, copy=False)
    bpp = 3
    raw = pix.reshape(h, w * bpp).astype(np.int16)
    if filter_mode == 2:
        # vectorized up-filter fast path (the corpus encoder's choice:
        # decodes via one cumsum, compresses gradients well)
        d = raw.copy()
        d[1:] -= raw[:-1]
        body = np.concatenate(
            [np.full((h, 1), 2, dtype=np.uint8),
             (d & 0xFF).astype(np.uint8)], axis=1).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        idat = zlib.compress(body, level)
        return (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
                + _chunk(b"IEND", b""))
    prev = np.zeros(w * bpp, dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        ft = (y % 5) if filter_mode < 0 else filter_mode
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - ((left + prev) >> 1)
        else:
            enc = cur - _paeth(left, prev, upleft)
        lines.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), level)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(PNG_SIG):
        raise ValueError("bad png signature")
    i = len(PNG_SIG)
    w = h = None
    idat = []
    while i + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + ln]
        if len(payload) != ln:
            raise ValueError("truncated png chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or ilace != 0:
                raise ValueError(f"unsupported png variant depth={depth} ctype={ctype}")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat:
        raise ValueError("png missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    bpp = 3
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("png payload size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    fts = arr[:, 0]
    if (fts > 4).any():
        raise ValueError(f"bad png filter type {int(fts.max())}")
    rows = arr[:, 1:]

    if (fts == 0).all():
        return rows.reshape(h, w, 3).copy()
    if (fts == 2).all():
        # up-filter everywhere: one cumsum down the columns (mod 256 is
        # linear, so int64 cumsum & 0xFF is exact) — the fast path the
        # synthetic corpus encoder emits
        return (rows.astype(np.int64).cumsum(axis=0) & 0xFF).astype(
            np.uint8).reshape(h, w, 3)

    out = np.zeros((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = rows[y].astype(np.int16)
        ft = fts[y]
        if ft == 0:
            pass
        elif ft == 2:
            cur = (cur + prev) & 0xFF
        elif ft == 1:
            # left-filter: per-channel prefix sum along the row
            px = cur.reshape(w, bpp).astype(np.int64)
            cur = (px.cumsum(axis=0) & 0xFF).astype(np.int16).reshape(stride)
        else:  # 3 (avg) and 4 (Paeth): true sequential dependency
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                if ft == 3:
                    cur[x : x + bpp] = (cur[x : x + bpp] + ((left + up) >> 1)) & 0xFF
                else:
                    cur[x : x + bpp] = (cur[x : x + bpp] + _paeth(left, up, upleft)) & 0xFF
                left = cur[x : x + bpp]
                upleft = up.astype(np.int16)
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def encode(pix: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(pix)
    if fmt == "ppm":
        return encode_ppm(pix)
    if fmt == "png":
        return encode_png(pix, filter_mode=2)
    if fmt == "rawq":
        return encode_rawq(pix, version=1)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode; `w`/`h` are required for raw/rawq (self-describing
    formats ignore them and the caller compares claimed vs real dims)."""
    if data is None:
        raise ValueError("null bytes")
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "rawq":
        return decode_rawq(data, w, h)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_ref(data: bytes, fmt: str, w: int, h: int) -> np.ndarray | None:
    """Reference decode for the PSNR fidelity check; None means the
    format is lossless (reference == production decode, PSNR = inf)."""
    if fmt == "rawq":
        return decode_rawq_ref(data, w, h)
    return None


# ---------------------------------------------------------------------------
# perceptual hash (64-bit average hash) + PSNR
# ---------------------------------------------------------------------------

def ahash64(pix: np.ndarray) -> int:
    """Deterministic 64-bit average hash: integer grayscale, 8x8 block
    means, bit = block mean > mean of block means.  Returns a SIGNED
    int64 (Spark LongType / parquet int64 compatible)."""
    h, w = pix.shape[:2]
    pf = pix.astype(np.int64)
    gray = pf[:, :, 0] * 299          # x1000 scale, integer =>
    gray += pf[:, :, 1] * 587         # deterministic; in-place adds
    gray += pf[:, :, 2] * 114         # avoid temporaries
    ys, xs, areas = _block_grid(h, w)
    # 8x8 block sums via two integer reduceats (deterministic: exact
    # integer addition in any grouping)
    sums = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
    means = sums / areas
    bits = (means > means.mean()).reshape(64)
    packed = np.packbits(bits)  # MSB-first per byte, big-endian order
    return int(np.frombuffer(packed.tobytes(), dtype=">i8")[0])


_GRID_CACHE: dict = {}


def _block_grid(h: int, w: int):
    key = (h, w)
    got = _GRID_CACHE.get(key)
    if got is None:
        ys2 = (np.arange(9) * h) // 8
        xs2 = (np.arange(9) * w) // 8
        areas = np.outer(ys2[1:] - ys2[:-1], xs2[1:] - xs2[:-1]).astype(
            np.float64)
        got = (ys2[:-1].copy(), xs2[:-1].copy(), areas)
        _GRID_CACHE[key] = got
    return got


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two uint8 images; inf when identical."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
