"""Synthetic `audio` table: schema + deterministic generator.

The audio twin of sources/images.py — opaque binary payload (mono
16-bit PCM WAV, encodable/decodable from scratch: kernels/audio.py)
plus typed metadata, per the driver instruction's multimodal-column
contract.  The generator seeds every audio quality-rule population:
normal tone-mixture clips, silent clips, hard-clipped clips,
too-short clips, DC-offset clips, white-noise clips, exact-duplicate
clusters (dedup driver), and truncated/garbage blobs (decode-failure
rows).  SF mapping: AUDIO_SF_ROWS (200k) clips at SF=1.0.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..constants import AUDIO_SF_ROWS, AUDIO_SR, GEN_SEED
from ..kernels.audio import encode_wav

AUDIO_DDL = ("clip_id string, bytes binary, sr int, "
             "n_samples int, caption string")

ARROW_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr", pa.int32()),
    ("n_samples", pa.int32()),
    ("caption", pa.string()),
])

# population shares
P_SILENT = 0.06
P_CLIPPED = 0.06
P_SHORT = 0.05
P_DC = 0.04
P_NOISE = 0.10
P_TRUNCATED = 0.01
P_DUP = 0.08
P_GAIN_DUP = 0.05   # volume-scaled re-encode of a cached clip:
                    # byte-DIFFERENT, fingerprint-NEAR (the case the
                    # exact digest misses and audio_fingerprint64
                    # catches)
N_DUP_CLUSTERS = 20


def audio_rows(sf: float) -> int:
    return max(1, int(round(AUDIO_SF_ROWS * sf)))


def audio_path(sf: float, root: str = "/root/repo/data") -> str:
    return os.path.join(root, f"audio_sf{sf:g}.parquet")


def _tone_mix(rng: np.random.Generator, n: int) -> np.ndarray:
    """A speech-band tone mixture with an amplitude envelope — the
    'good clip' population (loud, unclipped, spectrally mid-band)."""
    t = np.arange(n) / AUDIO_SR
    x = np.zeros(n)
    for _ in range(int(rng.integers(2, 5))):
        f = float(rng.uniform(120.0, 1800.0))
        x += float(rng.uniform(0.2, 0.8)) * np.sin(
            2 * np.pi * f * t + float(rng.uniform(0, 2 * np.pi)))
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * t
                                    * float(rng.uniform(0.5, 2.0))))
    x = x * env
    x = x / max(1e-9, np.abs(x).max()) * float(rng.uniform(0.25, 0.8))
    return np.clip(x * 32767.0, -32768, 32767).astype(np.int16)


def generate_pandas(sf: float) -> pd.DataFrame:
    rng = np.random.default_rng(GEN_SEED + 7)
    n = audio_rows(sf)
    rows = []
    dup_cache: list[np.ndarray] = []
    for i in range(n):
        u = rng.random()
        dur = float(rng.uniform(0.3, 1.2))
        ns = int(dur * AUDIO_SR)
        if u < P_SILENT:
            x = (rng.normal(0, 20.0, ns)).astype(np.int16)  # ~-64 dBFS
        elif u < P_SILENT + P_CLIPPED:
            x = _tone_mix(rng, ns).astype(np.float64) * 4.0
            x = np.clip(x, -32768, 32767).astype(np.int16)
        elif u < P_SILENT + P_CLIPPED + P_SHORT:
            ns = int(float(rng.uniform(0.02, 0.15)) * AUDIO_SR)
            x = _tone_mix(rng, max(ns, 1))
        elif u < P_SILENT + P_CLIPPED + P_SHORT + P_DC:
            x = _tone_mix(rng, ns).astype(np.float64) * 0.5
            x = np.clip(x + 32768.0 * 0.12, -32768, 32767).astype(np.int16)
        elif u < P_SILENT + P_CLIPPED + P_SHORT + P_DC + P_NOISE:
            x = np.clip(rng.normal(0, 6000.0, ns),
                        -32768, 32767).astype(np.int16)
        else:
            x = _tone_mix(rng, ns)
        blob = encode_wav(x, AUDIO_SR)
        if rng.random() < P_TRUNCATED:
            blob = blob[:int(rng.integers(4, 40))]
        elif rng.random() < P_DUP and dup_cache:
            x = dup_cache[int(rng.integers(0, len(dup_cache)))]
            blob = encode_wav(x, AUDIO_SR)   # byte-identical re-upload
        elif rng.random() < P_GAIN_DUP and dup_cache:
            base = dup_cache[int(rng.integers(0, len(dup_cache)))]
            x = (base.astype(np.float64)
                 * float(rng.uniform(0.4, 0.7))).astype(np.int16)
            blob = encode_wav(x, AUDIO_SR)   # volume-scaled re-encode
        elif len(dup_cache) < N_DUP_CLUSTERS:
            dup_cache.append(x)
        rows.append({
            "clip_id": f"aud_{i:012d}",
            "bytes": blob,
            "sr": AUDIO_SR,
            "n_samples": (len(blob) - 44) // 2 if len(blob) >= 44 else 0,
            "caption": f"clip {i} tone mixture sample",
        })
    return pd.DataFrame(rows)


def ensure_audio(sf: float, root: str = "/root/repo/data") -> str:
    """Generate-once cache; returns the parquet path.  `bytes` stays
    uncompressed (the images-table lesson: payload decompression
    dominates scan CPU)."""
    path = audio_path(sf, root)
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


def read_audio(spark, sf: float, root: str = "/root/repo/data"):
    """Schema-validated columnar scan of the audio table."""
    return spark.read.schema(AUDIO_DDL).parquet(ensure_audio(sf, root))
