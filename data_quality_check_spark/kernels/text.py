"""Shared character-vocabulary + heuristic text-rule kernels.

The langid and perplexity models (kernels/langid.py, kernels/ppl.py)
and the pandas oracle all build on these.  Everything is pure
numpy/pandas and deterministic (float64, fixed summation order).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..constants import (
    MAX_SYMBOL_DENSITY,
    MIN_DISTINCT_TOKEN_RATIO,
    MIN_STOPWORD_RATIO,
    STOPWORD_MIN_TOKENS,
    STOPWORD_SET,
    SYMBOL_CHAR_CLASS,
    WORD_POOLS,
)

# ---------------------------------------------------------------------------
# Character vocabulary: every char that appears in the training pools,
# plus ASCII printable.  id 0 is reserved for <unk>.  Deterministic:
# sorted by codepoint.
# ---------------------------------------------------------------------------


def build_vocab() -> dict[str, int]:
    chars = set(" abcdefghijklmnopqrstuvwxyz0123456789")
    for words in WORD_POOLS.values():
        for wrd in words:
            chars.update(wrd.lower())
    return {c: i + 1 for i, c in enumerate(sorted(chars))}


VOCAB = build_vocab()
V = len(VOCAB) + 1  # +1 for <unk> id 0

# dense codepoint -> id lookup for the BMP (fast vectorized encoding)
_LUT = np.zeros(0x10000, dtype=np.int32)
for _c, _i in VOCAB.items():
    _LUT[ord(_c)] = _i


MAX_MODEL_CHARS = 10_000  # model-scoring clamp: langid/ppl scores
# converge long before this, and an adversarial multi-MB caption must
# not blow up worker memory (the scrub/rule paths stay exact on the
# full text).  Shared by the oracle => no parity impact.


def encode_chars(texts: "pd.Series | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Lowercase, map chars to vocab ids; returns (codes, row_lengths).

    codes is the concatenation of all rows' id sequences; lengths[i]
    is row i's length (0 for null/empty).  Vectorized via a single
    join + frombuffer.
    """
    if isinstance(texts, pd.Series):
        texts = texts.tolist()
    cleaned = [
        (t[:MAX_MODEL_CHARS].lower() if isinstance(t, str) else "")
        for t in texts
    ]
    lengths = np.fromiter((len(t) for t in cleaned), dtype=np.int64, count=len(cleaned))
    blob = "".join(cleaned)
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    codes = np.where(cp < 0x10000, _LUT[np.minimum(cp, 0xFFFF)], 0).astype(np.int64)
    return codes, lengths


# ---------------------------------------------------------------------------
# Heuristic rules — pandas kernel (the oracle side).  The Spark side
# expresses the *same* semantics as Column expressions in
# functions/rules.py; tests/test_rules_vs_oracle.py asserts equality
# on the full synthetic table.
# Tokenization contract: split on single space, drop empty tokens.
# ---------------------------------------------------------------------------

_SYMBOL_RE = re.compile(SYMBOL_CHAR_CLASS)
_STOP = frozenset(STOPWORD_SET)


def tokenize(caption: str) -> list[str]:
    return [t for t in caption.split(" ") if t]


def heuristic_stats(captions: pd.Series) -> pd.DataFrame:
    """Per-row: n_chars, n_tokens, distinct_ratio, stopword_ratio,
    symbol_density and the three rule booleans (True == violation)."""
    out = {
        "n_chars": [], "n_tokens": [], "distinct_ratio": [],
        "stopword_ratio": [], "symbol_density": [],
    }
    for cap in captions:
        if not isinstance(cap, str):
            cap = ""
        toks = tokenize(cap)
        n_tok = len(toks)
        out["n_chars"].append(len(cap))
        out["n_tokens"].append(n_tok)
        out["distinct_ratio"].append(
            len(set(toks)) / n_tok if n_tok else 1.0)
        out["stopword_ratio"].append(
            sum(1 for t in toks if t in _STOP) / n_tok if n_tok else 0.0)
        out["symbol_density"].append(
            len(_SYMBOL_RE.findall(cap)) / len(cap) if cap else 0.0)
    df = pd.DataFrame(out)
    df["repetition_bad"] = (df.n_tokens > 0) & (df.distinct_ratio < MIN_DISTINCT_TOKEN_RATIO)
    df["stopword_bad"] = (df.n_tokens >= STOPWORD_MIN_TOKENS) & (
        df.stopword_ratio < MIN_STOPWORD_RATIO)
    df["symbol_bad"] = df.symbol_density > MAX_SYMBOL_DENSITY
    return df
