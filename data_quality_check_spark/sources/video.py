"""Synthetic `video` table: RVID container generator + schema.

Populations seed the video quality rules: normal moving-pattern
clips, STATIC clips (every frame identical — the re-encoded
thumbnail loop a web crawl is full of), near-black clips, too-short
clips, and truncated blobs (decode-failure rows)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..constants import GEN_SEED, VIDEO_FPS, VIDEO_H, VIDEO_SF_ROWS, VIDEO_W
from ..kernels.video import encode_rvid

VIDEO_DDL = ("video_id string, bytes binary, fps int, "
             "n_frames int, caption string")

ARROW_SCHEMA = pa.schema([
    ("video_id", pa.string()),
    ("bytes", pa.binary()),
    ("fps", pa.int32()),
    ("n_frames", pa.int32()),
    ("caption", pa.string()),
])

P_STATIC = 0.08
P_BLACK = 0.05
P_SHORT = 0.05
P_TRUNCATED = 0.01
P_RECODE = 0.06     # brightness-shifted copy of a cached clip:
                    # byte-different, fingerprint-near (ahash is
                    # brightness-shift-invariant)
N_RECODE_CACHE = 15


def video_rows(sf: float) -> int:
    return max(1, int(round(VIDEO_SF_ROWS * sf)))


def video_path(sf: float, root: str = "/root/repo/data") -> str:
    return os.path.join(root, f"video_sf{sf:g}.parquet")


def _moving(rng: np.random.Generator, n: int,
            h: int = VIDEO_H, w: int = VIDEO_W) -> np.ndarray:
    """Drifting 2-D gradient + per-frame noise: nonzero motion, mid
    luminance — the 'good clip' population."""
    yy, xx = np.mgrid[0:h, 0:w]
    phase = float(rng.uniform(0, 2 * np.pi))
    speed = float(rng.uniform(0.2, 1.0))
    amp = float(rng.uniform(40, 100))
    base = float(rng.uniform(80, 160))
    frames = np.empty((n, h, w), dtype=np.uint8)
    for t in range(n):
        f = base + amp * np.sin(
            2 * np.pi * (xx + yy + speed * t * 3) / 24.0 + phase)
        f = f + rng.normal(0, 6.0, (h, w))
        frames[t] = np.clip(f, 0, 255).astype(np.uint8)
    return frames


def generate_pandas(sf: float, *, h: int = VIDEO_H, w: int = VIDEO_W,
                    nf_lo: int = 8, nf_hi: int = 33) -> pd.DataFrame:
    """Default parameters reproduce the fixture corpora bit-for-bit
    (the shape arguments don't touch the rng consumption order); the
    overrides exist for the data-dominated scaling corpus
    (ensure_video_big), where each clip carries ~40x the decode
    payload of the sandbox fixture."""
    rng = np.random.default_rng(GEN_SEED + 11)
    n = video_rows(sf)
    rows = []
    recode_cache: list[np.ndarray] = []
    for i in range(n):
        u = rng.random()
        nf = int(rng.integers(nf_lo, nf_hi))
        if u < P_STATIC:
            frames = np.repeat(_moving(rng, 1, h, w), nf, axis=0)
        elif u < P_STATIC + P_BLACK:
            frames = rng.integers(0, 6, (nf, h, w)).astype(np.uint8)
        elif u < P_STATIC + P_BLACK + P_SHORT:
            nf = int(rng.integers(1, 4))
            frames = _moving(rng, nf, h, w)
        elif u < P_STATIC + P_BLACK + P_SHORT + P_RECODE \
                and recode_cache:
            base = recode_cache[int(rng.integers(0, len(recode_cache)))]
            delta = int(rng.integers(10, 35))
            frames = np.clip(base.astype(np.int16) + delta,
                             0, 255).astype(np.uint8)
            nf = frames.shape[0]
        else:
            frames = _moving(rng, nf, h, w)
            if len(recode_cache) < N_RECODE_CACHE:
                recode_cache.append(frames)
        blob = encode_rvid(frames, VIDEO_FPS)
        if rng.random() < P_TRUNCATED:
            blob = blob[:int(rng.integers(4, 12))]
        rows.append({
            "video_id": f"vid_{i:012d}",
            "bytes": blob,
            "fps": VIDEO_FPS,
            "n_frames": nf,
            "caption": f"clip {i} moving gradient",
        })
    return pd.DataFrame(rows)


def ensure_video(sf: float, root: str = "/root/repo/data") -> str:
    path = video_path(sf, root)
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        pdf = generate_pandas(sf)
        tbl = pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA,
                                   preserve_index=False)
        codecs_map = {name: "zstd" for name in tbl.schema.names}
        codecs_map["bytes"] = "none"
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, compression=codecs_map,
                       row_group_size=2048)
        os.replace(tmp, path)
    return path


def read_video(spark, sf: float, root: str = "/root/repo/data"):
    return spark.read.schema(VIDEO_DDL).parquet(ensure_video(sf, root))


def ensure_video_big(root: str = "/tmp/dqc-video-big") -> str:
    """Data-dominated scaling corpus (the audio 5x-variant recipe,
    sized for video): 4000 clips at 64x64 with 24..56 frames ->
    ~0.65 GB of RVID payload, ~40x the sandbox fixture's per-clip
    decode work.  Deterministic (same generator, same seed), written
    once under /tmp (too big for the repo's data/ cache dir),
    sharded so the scan parallelizes without maxPartitionBytes
    games."""
    path = os.path.join(root, "video_big.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    pdf = generate_pandas(0.2, h=64, w=64, nf_lo=24, nf_hi=57)
    tbl = pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA,
                               preserve_index=False)
    codecs_map = {name: "zstd" for name in tbl.schema.names}
    codecs_map["bytes"] = "none"
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, compression=codecs_map,
                   row_group_size=64)
    os.replace(tmp, path)
    return path
