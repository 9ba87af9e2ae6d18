"""KenLM-style character n-gram perplexity (SURVEY.md §2 O-11).

Char trigram LM with stupid backoff (factor 0.4) trained at import
time on the combined word pools of all five languages; the backoff is
baked into one dense (V, V, V) float32 log-prob tensor so scoring is a
single vectorized gather + segment mean.  ppl = exp(-mean ln p) over
the trigrams of the (lowercased) text; texts shorter than 3 chars get
ppl = PPL_SHORT (treated as un-scorable, does not trip the rule).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd

from ..constants import PPL_BACKOFF, WORD_POOLS
from .text import V, encode_chars

PPL_SHORT = 1.0  # neutral value for texts with < 3 chars


def _train() -> np.ndarray:
    corpus = " ".join(" ".join(WORD_POOLS[lang]) for lang in sorted(WORD_POOLS))
    codes, _ = encode_chars([corpus])
    c1 = np.zeros(V, dtype=np.float64)
    c2 = np.zeros((V, V), dtype=np.float64)
    c3 = np.zeros((V, V, V), dtype=np.float64)
    np.add.at(c1, codes, 1.0)
    np.add.at(c2, (codes[:-1], codes[1:]), 1.0)
    np.add.at(c3, (codes[:-2], codes[1:-1], codes[2:]), 1.0)
    total = c1.sum()
    # unigram with floor so unseen chars get a tiny but finite prob
    p1 = (c1 + 0.5) / (total + 0.5 * V)
    with np.errstate(divide="ignore", invalid="ignore"):
        p2 = np.where(c1[:, None] > 0, c2 / np.maximum(c1[:, None], 1), 0.0)
        p3 = np.where(c2[:, :, None] > 0, c3 / np.maximum(c2[:, :, None], 1), 0.0)
    # stupid backoff baked dense: p(c3|c1c2) = p3 or b*p2 or b^2*p1
    backed = np.where(
        p3 > 0, p3,
        np.where(p2[None, :, :] > 0, PPL_BACKOFF * p2[None, :, :],
                 PPL_BACKOFF * PPL_BACKOFF * p1[None, None, :]),
    )
    return np.log(backed).astype(np.float32)


def _corpus_key() -> str:
    blob = repr(sorted(WORD_POOLS.items())) + f"|V={V}|b={PPL_BACKOFF}"
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _load_or_train() -> np.ndarray:
    """Training costs ~0.3s; with dozens of Python workers per
    executor that dominates worker spin-up, so the dense tensor is
    cached on local disk keyed by the training-corpus hash.  On a
    real cluster ship the .npy via spark-submit --files (or let each
    worker pay the one-time train)."""
    cache_dir = os.environ.get(
        "DQC_MODEL_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "data", "models"))
    path = os.path.join(cache_dir, f"ppl3_{_corpus_key()}.npy")
    if os.path.exists(path):
        try:
            arr = np.load(path)
            if arr.shape == (V, V, V):
                return arr
        except Exception:
            pass
    arr = _train()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".npy.tmp")
        with os.fdopen(fd, "wb") as f:
            np.save(f, arr)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort
    return arr


_LOGP3: np.ndarray = _load_or_train()


def perplexity(texts: "pd.Series | list[str]") -> np.ndarray:
    """-> float64 ppl per input row."""
    codes, lengths = encode_chars(texts)
    n = len(lengths)
    out = np.full(n, PPL_SHORT, dtype=np.float64)
    if n == 0 or len(codes) < 3:
        return out
    ends = np.cumsum(lengths)
    tri_lp = _LOGP3[codes[:-2], codes[1:-1], codes[2:]].astype(np.float64)
    # trigram j spans rows via its first char j; valid iff j+2 same row
    row_of = np.searchsorted(ends, np.arange(len(codes)), side="right")
    valid = row_of[:-2] == row_of[2:]
    tri_lp = np.where(valid, tri_lp, 0.0)
    n_tri = np.maximum(lengths - 2, 0)
    # per-row sums via bincount: sequential per-bin accumulation =>
    # batch-composition-invariant (see kernels/langid.py rationale)
    sums = np.bincount(row_of[:-2], weights=tri_lp, minlength=n)
    with np.errstate(over="ignore"):
        ppl = np.exp(-sums / np.maximum(n_tri, 1))
    out = np.where(n_tri > 0, ppl, PPL_SHORT)
    return out
