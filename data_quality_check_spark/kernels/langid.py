"""fastText-style language identification, trained at import time on
the deterministic word pools in constants (no fasttext binary / no
network in the sandbox — SURVEY.md §2 O-10).

Model: per-language character-bigram log-probability matrix with
Laplace smoothing over the shared vocab (kernels/text.py).  Scoring is
fully vectorized: one gather + segment-sum per batch.  Classification:
argmax of mean log-prob; confidence via temperature softmax; `und`
when confidence < MIN_LANG_CONF or fewer than MIN_ALPHA_CHARS
informative chars.

Both the Spark pandas-UDF (functions/udfs.py) and the pandas oracle
call `classify()` — identical results by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..constants import (
    LANG_UND,
    LANGID_SOFTMAX_TEMP,
    LANGS,
    MIN_ALPHA_CHARS,
    MIN_LANG_CONF,
    WORD_POOLS,
)
from .text import V, encode_chars


def _train() -> np.ndarray:
    """(n_langs, V, V) float64 log P(c2 | c1), Laplace alpha=1."""
    mats = np.ones((len(LANGS), V, V), dtype=np.float64)  # Laplace
    for li, lang in enumerate(LANGS):
        corpus = " ".join(WORD_POOLS[lang])
        codes, _ = encode_chars([corpus])
        np.add.at(mats[li], (codes[:-1], codes[1:]), 1.0)
    mats /= mats.sum(axis=2, keepdims=True)
    return np.log(mats)


_LOGP: np.ndarray = _train()  # built once per process (driver, worker, oracle)


def classify(texts: "pd.Series | list[str]") -> pd.DataFrame:
    """-> DataFrame[lang:str, lang_conf:float64], one row per input."""
    codes, lengths = encode_chars(texts)
    n = len(lengths)
    langs = np.full(n, LANG_UND, dtype=object)
    confs = np.zeros(n, dtype=np.float64)
    if n == 0:
        return pd.DataFrame({"lang": langs, "lang_conf": confs})

    ends = np.cumsum(lengths)
    starts = ends - lengths
    # bigram log-probs for every adjacent pair, masked at row borders
    if len(codes) >= 2:
        c1, c2 = codes[:-1], codes[1:]
        pair_lp = _LOGP[:, c1, c2]  # (L, total-1)
        # pair j spans codes[j], codes[j+1]: valid iff both in same row
        row_of = np.searchsorted(ends, np.arange(len(codes)), side="right")
        valid = row_of[:-1] == row_of[1:]
        pair_lp = np.where(valid, pair_lp, 0.0)
        n_pairs = np.maximum(lengths - 1, 0)
        # per-row sums via bincount: strictly sequential per-bin
        # accumulation in array order, so a row's sum depends ONLY on
        # its own pair values (masked boundary pairs add exactly 0.0)
        # => bitwise-identical for any batch composition (scalar-iter
        # UDF batches vs the one-batch oracle).  reduceat/np.sum use
        # pairwise trees whose shape varies with neighbouring rows.
        pair_rows = row_of[:-1]
        sums = np.stack([
            np.bincount(pair_rows, weights=pair_lp[li], minlength=n)
            for li in range(len(LANGS))
        ])
        mean_lp = np.where(n_pairs > 0, sums / np.maximum(n_pairs, 1), -np.inf)
    else:
        mean_lp = np.full((len(LANGS), n), -np.inf)

    # informative chars = non-space vocab hits per row
    informative = np.zeros(n, dtype=np.int64)
    space_id_codes = encode_chars([" "])[0]
    space_id = int(space_id_codes[0]) if len(space_id_codes) else -1
    good = (codes != 0) & (codes != space_id)
    if len(codes):
        np.add.at(informative, np.searchsorted(ends, np.arange(len(codes)), side="right"), good)

    with np.errstate(invalid="ignore"):
        z = mean_lp * LANGID_SOFTMAX_TEMP
        z = z - z.max(axis=0, keepdims=True)
        ez = np.exp(z)
        sm = ez / ez.sum(axis=0, keepdims=True)
    best = np.argmax(mean_lp, axis=0)
    best_conf = sm[best, np.arange(n)]
    ok = (informative >= MIN_ALPHA_CHARS) & (best_conf >= MIN_LANG_CONF) & (lengths > 1)
    lang_arr = np.array(LANGS, dtype=object)[best]
    langs = np.where(ok, lang_arr, LANG_UND)
    # `und` rows keep the (low) softmax confidence — informative for
    # downstream audits; the rule gate is lang == 'und', not the conf
    confs = np.nan_to_num(best_conf, nan=0.0)
    return pd.DataFrame({"lang": langs, "lang_conf": confs.astype(np.float64)})
