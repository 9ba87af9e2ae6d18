"""RVID parse + stride frame sampling + per-video statistics.

ffmpeg-class video decode is unavailable in the sandbox, so per the
driver's multimodal rule the DECODE target is a deterministic
stand-in — RVID, a from-scratch raw-gray-frame container — while the
Spark-side plumbing (schema, fused Arrow UDF, batch shape, frame
sampling, statistics, rules) is the real production shape: swap
`parse_rvid` for an ffmpeg frame extractor on a cluster and nothing
else changes.

RVID layout (little-endian):
    b"RVID" | u16 w | u16 h | u16 fps | u32 n_frames
    | n_frames * (w*h) bytes of row-major uint8 gray frames

Statistics are per-ROW reductions over that row's own sampled
frames — batch-composition-invariant by construction.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RVID"
_HDR = struct.Struct("<HHHI")


def encode_rvid(frames: np.ndarray, fps: int) -> bytes:
    """(n, h, w) uint8 -> RVID bytes (generator/tests)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    return MAGIC + _HDR.pack(w, h, fps, n) + f.tobytes()


def parse_rvid(blob: bytes) -> tuple[int, np.ndarray]:
    """Strict parse -> (fps, frames (n, h, w) uint8).  Raises
    ValueError on truncation or a bad header — undecodable rows fail
    every video rule, same contract as the image/audio decoders."""
    if blob is None or len(blob) < 4 + _HDR.size or blob[:4] != MAGIC:
        raise ValueError("not an RVID blob")
    w, h, fps, n = _HDR.unpack_from(blob, 4)
    # w/h < 8 would break frame_ahash64's 8x8 block reshape DOWNSTREAM
    # of the parse guard (one tiny-but-parseable blob would then fail
    # the whole Spark task instead of NULLing its row) — reject here,
    # same "undecodable rows fail every rule" contract
    if w < 8 or h < 8 or fps == 0:
        raise ValueError("bad RVID header")
    body = blob[4 + _HDR.size:]
    need = n * w * h
    if len(body) != need:
        raise ValueError("truncated RVID payload")
    return fps, np.frombuffer(body, dtype=np.uint8).reshape(n, h, w)


def sample_indices(n_frames: int, k: int) -> np.ndarray:
    """Deterministic stride sampling: k evenly spaced frame indices
    (all frames when n <= k) — the production pattern for 'look at a
    bounded number of frames regardless of clip length'."""
    if n_frames <= k:
        return np.arange(n_frames)
    return np.floor(np.linspace(0, n_frames - 1, k)).astype(np.int64)


def video_stats(frames: np.ndarray, fps: int, k: int) -> dict:
    """Sampled-frame statistics: luminance mean/std across sampled
    frames, mean inter-frame motion (|diff|/255 between consecutive
    SAMPLED frames), near-black sampled-frame share."""
    n = int(frames.shape[0])
    out = {"n_frames": n, "duration_s": n / float(fps)}
    if n == 0:
        out.update(lum_mean=0.0, lum_std=0.0, motion=0.0, black_frac=1.0)
        return out
    idx = sample_indices(n, k)
    s = frames[idx].astype(np.float64)
    means = s.mean(axis=(1, 2))
    out["lum_mean"] = float(means.mean())
    out["lum_std"] = float(means.std())
    if len(idx) > 1:
        d = np.abs(np.diff(s, axis=0)).mean(axis=(1, 2)) / 255.0
        out["motion"] = float(d.mean())
    else:
        out["motion"] = 0.0
    out["black_frac"] = float(np.count_nonzero(means < 10.0)) / len(idx)
    return out


def frame_ahash64(frame: np.ndarray) -> int:
    """Average-hash of one gray frame: 8x8 block means thresholded at
    their own mean.  Invariant to uniform brightness shift (both
    sides of the comparison move together, up to clipping) — the
    visual analog of the audio fingerprint's gain invariance."""
    h, w = frame.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    f = frame[:bh * 8, :bw * 8].astype(np.float64)
    blocks = f.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    m = blocks.mean()
    bits = 0
    flat = blocks.ravel()
    for i in range(64):
        if flat[i] > m:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def video_fingerprint64(frames: np.ndarray, k: int) -> int:
    """64-bit video fingerprint: per-bit MAJORITY vote across the
    stride-sampled frames' ahashes — stable under dropped/extra
    frames at the ends and under uniform brightness shifts."""
    n = int(frames.shape[0])
    if n == 0:
        return 0
    idx = sample_indices(n, k)
    counts = np.zeros(64, dtype=np.int64)
    for i in idx:
        a = frame_ahash64(frames[i]) & ((1 << 64) - 1)
        for b in range(64):
            counts[b] += (a >> b) & 1
    half = len(idx) / 2.0
    bits = 0
    for b in range(64):
        if counts[b] > half:
            bits |= 1 << b
    return bits - (1 << 64) if bits >= (1 << 63) else bits
