"""Compiled-pattern PII / toxicity scrub kernel (SURVEY.md §2 O-12,
BASELINE.json:6 "regex-based PII/email/phone/toxicity scrubbing ...
compiled-pattern pandas UDF").

Patterns compile once at module import; `scrub_series` is the single
implementation used by both the Spark pandas-UDF and the pandas
oracle, so scrubbed captions match exactly (BASELINE.md "scrubbed
caption: exact string equality").
"""

from __future__ import annotations

import re

import pandas as pd

from ..constants import SCRUB_PATTERNS, TOXIC_REPLACEMENT, TOXIC_WORDS

COMPILED: list[tuple[str, re.Pattern, str]] = [
    (name, re.compile(pat), repl) for name, pat, repl in SCRUB_PATTERNS
]
TOXIC_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(w) for w in TOXIC_WORDS) + r")\b",
    re.IGNORECASE,
)

HIT_KEYS = [name for name, _, _ in SCRUB_PATTERNS] + ["toxic"]


def scrub_series(captions: pd.Series) -> pd.DataFrame:
    """-> DataFrame[caption_scrubbed:str, scrub_hits:dict, toxic:bool].

    scrub_hits maps pattern name -> count (only names with count > 0,
    keeping the map small on clean data).  Null captions scrub to null.
    """
    n = len(captions)
    vals = captions.to_numpy(dtype=object)
    scrubbed: list = [None] * n
    hits: list = [None] * n
    toxic = [False] * n
    all_res = [(name, cre.subn, repl) for name, cre, repl in COMPILED]
    tox_subn = TOXIC_RE.subn
    for i in range(n):
        t = vals[i]
        if not isinstance(t, str):
            hits[i] = {}
            continue
        d = {}
        for name, subn, repl in all_res:  # one pass per pattern (subn
            t, c = subn(repl, t)          # replaces AND counts)
            if c:
                d[name] = c
        t, c = tox_subn(TOXIC_REPLACEMENT, t)
        if c:
            d["toxic"] = c
            toxic[i] = True
        scrubbed[i] = t
        hits[i] = d
    return pd.DataFrame({
        "caption_scrubbed": scrubbed,
        "scrub_hits": hits,
        "toxic": toxic,
    })
