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
    s = captions.astype("object")
    null_mask = s.isna()
    work = s.fillna("")
    counts = {}
    for name, cre, repl in COMPILED:
        counts[name] = work.str.count(cre)
        work = work.str.replace(cre, repl, regex=True)
    counts["toxic"] = work.str.count(TOXIC_RE)
    work = work.str.replace(TOXIC_RE, TOXIC_REPLACEMENT, regex=True)

    hits = []
    cnt_cols = [counts[k].to_numpy() for k in HIT_KEYS]
    for i in range(len(work)):
        d = {k: int(col[i]) for k, col in zip(HIT_KEYS, cnt_cols) if col[i] > 0}
        hits.append(d)
    toxic = (counts["toxic"] > 0).to_numpy()
    out = pd.DataFrame({
        "caption_scrubbed": work.where(~null_mask, None),
        "scrub_hits": hits,
        "toxic": toxic,
    })
    return out
