"""Synthetic `images` table: schema + deterministic generator.

The reference ships no data (it is a 2-line README —
/root/reference/README.md); the input shape is mandated by
BASELINE.json:15: (image_id string, bytes binary, w int32, h int32,
fmt string, caption string, phash int64).  Per the driver instruction
the table is synthesized deterministically at small scale; SF=1.0 ≙
1,000,000 rows (BASELINE.md "Sandbox scale mapping").

The generator seeds every quality-rule population (FIXTURES.md §A1):
language mix + gibberish, length/repetition/stopword/symbol
violations, PII injections, toxic words, duplicate clusters sharing a
phash (skew driver), and corrupt rows (null caption, w/h mismatch,
truncated bytes).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..constants import GEN_SEED, LANGS, SF_ROWS, STOPWORDS, WORD_POOLS
from ..kernels import codecs

IMAGES_DDL = (
    "image_id string, bytes binary, w int, h int, "
    "fmt string, caption string, phash bigint"
)

ARROW_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

# population shares (FIXTURES.md §A1)
P_GIBBERISH = 0.05
P_TOO_SHORT = 0.05
P_TOO_LONG = 0.03
P_REPETITION = 0.05
P_SYMBOL = 0.04
P_LOW_STOPWORD = 0.04
P_EMAIL, P_PHONE, P_IP, P_URL, P_TOXIC = 0.06, 0.04, 0.02, 0.02, 0.01
P_DUP = 0.10
N_DUP_CLUSTERS = 50
P_NULL_CAPTION = 0.01
P_DIM_MISMATCH = 0.005
P_TRUNCATED = 0.005
P_RAWQ_V2 = 0.10   # share of rawq rows using the coarse 2-bit profile
                   # whose decoder-pair PSNR (~20 dB) fails the 40 dB
                   # pixel invariant (BASELINE.json:15 lossy branch)

_ASCII = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"), dtype=object)
_SYMS = np.array(list("!@#$%^&*(){}[]<>|~`=+;:"), dtype=object)


def sf_rows(sf: float) -> int:
    return max(1, int(round(SF_ROWS * sf)))


def _caption(rng: np.random.Generator, lang: str, n_words: int) -> str:
    """Natural caption: every 4th word is a stopword, so real captions
    clear the stopword-ratio rule by construction (>= 0.25 share)."""
    pool = WORD_POOLS[lang]
    stops = STOPWORDS[lang]
    idx = rng.integers(0, len(pool), n_words)
    sidx = rng.integers(0, len(stops), n_words)
    return " ".join(
        stops[sidx[j]] if j % 4 == 0 else pool[idx[j]] for j in range(n_words))


def _gibberish(rng: np.random.Generator, n_chars: int) -> str:
    return "".join(_ASCII[rng.integers(0, len(_ASCII), n_chars)])


def _pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Smooth gradient + noise: compresses well, decodes non-trivially."""
    gx = np.linspace(0, 1, w, dtype=np.float64)[None, :]
    gy = np.linspace(0, 1, h, dtype=np.float64)[:, None]
    coef = rng.uniform(-255, 255, (3, 3))      # per-channel random plane
    freq = rng.uniform(1.0, 6.0, 3)            # plus a random ripple
    chans = []
    for c in range(3):
        field = (coef[c, 0] * gx + coef[c, 1] * gy + coef[c, 2]
                 + 64.0 * np.sin(freq[c] * np.pi * (gx + gy)))
        chans.append(field)
    base = np.stack(chans, axis=-1) + 128.0
    noise = rng.integers(0, 32, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def generate_pandas(sf: float, seed: int = GEN_SEED) -> pd.DataFrame:
    """Deterministic images table as pandas (column order = schema)."""
    n = sf_rows(sf)
    rng = np.random.default_rng([seed, int(round(sf * 1_000_000))])

    # -- caption populations ------------------------------------------------
    langs = np.array(LANGS, dtype=object)[rng.integers(0, len(LANGS), n)]
    u = rng.random(n)
    captions: list = []
    for i in range(n):
        lang = langs[i]
        x = u[i]
        if x < P_GIBBERISH:
            captions.append(_gibberish(rng, int(rng.integers(20, 60))))
        elif x < P_GIBBERISH + P_TOO_SHORT:
            captions.append(_caption(rng, lang, 1)[:8])
        elif x < P_GIBBERISH + P_TOO_SHORT + P_TOO_LONG:
            captions.append(_caption(rng, lang, 160))
        elif x < P_GIBBERISH + P_TOO_SHORT + P_TOO_LONG + P_REPETITION:
            word = _caption(rng, lang, 1)
            captions.append(" ".join([word] * int(rng.integers(8, 20))))
        elif x < P_GIBBERISH + P_TOO_SHORT + P_TOO_LONG + P_REPETITION + P_SYMBOL:
            base = _caption(rng, lang, int(rng.integers(4, 8)))
            syms = "".join(_SYMS[rng.integers(0, len(_SYMS), len(base))])
            captions.append(base + " " + syms)
        elif x < (P_GIBBERISH + P_TOO_SHORT + P_TOO_LONG + P_REPETITION
                  + P_SYMBOL + P_LOW_STOPWORD):
            # content words only, from the non-stopword tail of the pool
            pool = WORD_POOLS[lang][10:]
            captions.append(" ".join(
                pool[j] for j in rng.integers(0, len(pool), int(rng.integers(6, 12)))))
        else:
            captions.append(_caption(rng, lang, int(rng.integers(6, 18))))

    # PII / toxic injections (independent draws)
    for i in range(n):
        r = rng.random()
        if r < P_EMAIL:
            captions[i] += f" contact user{i % 997}@example{i % 13}.com"
        elif r < P_EMAIL + P_PHONE:
            captions[i] += f" call +{1 + i % 9} {200 + i % 700} {1000 + i % 9000} {10 + i % 90}"
        elif r < P_EMAIL + P_PHONE + P_IP:
            captions[i] += f" host 10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}"
        elif r < P_EMAIL + P_PHONE + P_IP + P_URL:
            captions[i] += f" see https://example{i % 13}.com/p/{i}"
        elif r < P_EMAIL + P_PHONE + P_IP + P_URL + P_TOXIC:
            captions[i] += " you frakk"

    # -- images -------------------------------------------------------------
    fmts = np.array(["raw", "ppm", "png", "rawq"], dtype=object)[
        np.searchsorted([0.55, 0.80, 0.94], rng.random(n))]
    ws = rng.integers(8, 65, n).astype(np.int32)
    hs = rng.integers(8, 65, n).astype(np.int32)
    rawq_v2 = rng.random(n) < P_RAWQ_V2

    # duplicate clusters: 10% of rows share one of 50 cluster images
    dup_mask = rng.random(n) < P_DUP
    cluster_of = rng.integers(0, N_DUP_CLUSTERS, n)
    # lossy-encoded duplicates would hash the QUANTIZED pixels and
    # escape phash-equality dup ranking — keep dup rows lossless
    fmts = np.where(dup_mask & (fmts == "rawq"), "raw", fmts)
    crng = np.random.default_rng([seed, 777])
    cluster_pix = []
    for c in range(N_DUP_CLUSTERS):
        cw, ch = int(crng.integers(16, 49)), int(crng.integers(16, 49))
        cluster_pix.append(_pixels(crng, cw, ch))

    blobs: list[bytes] = []
    phashes = np.zeros(n, dtype=np.int64)
    for i in range(n):
        if dup_mask[i]:
            pix = cluster_pix[cluster_of[i]]
            hs[i], ws[i] = pix.shape[0], pix.shape[1]
        else:
            pix = _pixels(rng, int(ws[i]), int(hs[i]))
        if fmts[i] == "rawq":
            blob = codecs.encode_rawq(pix, 2 if rawq_v2[i] else 1)
            # lossy: the invariant phash is defined on the production
            # decode, so v1 rows pass dims+phash and are then judged
            # purely by the PSNR threshold
            phashes[i] = codecs.ahash64(
                codecs.decode(blob, "rawq", pix.shape[1], pix.shape[0]))
        else:
            blob = codecs.encode(pix, fmts[i])
            phashes[i] = codecs.ahash64(pix)
        blobs.append(blob)

    # -- corruption ---------------------------------------------------------
    cr = rng.random(n)
    null_cap = cr < P_NULL_CAPTION
    dim_bad = (cr >= P_NULL_CAPTION) & (cr < P_NULL_CAPTION + P_DIM_MISMATCH)
    trunc = (cr >= P_NULL_CAPTION + P_DIM_MISMATCH) & (
        cr < P_NULL_CAPTION + P_DIM_MISMATCH + P_TRUNCATED)
    for i in np.nonzero(null_cap)[0]:
        captions[i] = None
    ws = np.where(dim_bad, ws + 1, ws).astype(np.int32)
    for i in np.nonzero(trunc)[0]:
        blobs[i] = blobs[i][: max(1, len(blobs[i]) // 2)]

    return pd.DataFrame({
        "image_id": [f"img_{i:012d}" for i in range(n)],
        "bytes": blobs,
        "w": ws,
        "h": hs,
        "fmt": fmts,
        "caption": captions,
        "phash": phashes,
    })


def images_path(sf: float, root: str = "/root/repo/data") -> str:
    return os.path.join(root, f"images_sf{sf:g}.parquet")


def ensure_images(sf: float, root: str = "/root/repo/data") -> str:
    """Generate-once cache; returns the parquet path."""
    path = images_path(sf, root)
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        pdf = generate_pandas(sf)
        tbl = pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA, preserve_index=False)
        tmp = path + ".tmp"
        # bytes stays uncompressed: encoded images barely compress but
        # zstd-decoding them dominated scan CPU (~130 core-s at SF=1)
        codecs_map = {name: "zstd" for name in tbl.schema.names}
        codecs_map["bytes"] = "none"
        pq.write_table(tbl, tmp, compression=codecs_map, row_group_size=2048)
        os.replace(tmp, path)
    return path


def read_images(spark, sf: float, root: str = "/root/repo/data"):
    """Schema-validated columnar scan (SURVEY.md §2 O-1)."""
    df = spark.read.schema(IMAGES_DDL).parquet(ensure_images(sf, root))
    return df
