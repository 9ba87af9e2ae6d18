"""Pure-pandas reference oracle (SURVEY.md §0.1, §3 E3).

The reference repo ships no executable code (/root/reference is a
2-line README), so "the reference's keep/drop labels"
(BASELINE.json:14) are produced here: a single-process pandas/numpy
implementation of the exact rule definitions, built on the SAME
kernels + constants modules the Spark pipeline uses.  The distributed
pipeline is scored against this output (F1 >= 0.99, target 1.0).

No Spark imports allowed in this file.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_quality_check_spark.constants import (
    MAX_CAPTION_LEN,
    MAX_PPL,
    MIN_CAPTION_LEN,
    MIN_PSNR_DB,
    RULE_DUP,
    RULE_LANG,
    RULE_NULL,
    RULE_ORDER,
    RULE_PIXEL,
    RULE_PPL,
    RULE_REPETITION,
    RULE_STOPWORD,
    RULE_SYMBOL,
    RULE_TOO_LONG,
    RULE_TOO_SHORT,
    RULE_TOXIC,
    LANG_UND,
)
from data_quality_check_spark.kernels import codecs
from data_quality_check_spark.kernels.langid import classify
from data_quality_check_spark.kernels.ppl import perplexity
from data_quality_check_spark.kernels.scrub import scrub_series
from data_quality_check_spark.kernels.text import heuristic_stats


def evaluate(pdf: pd.DataFrame) -> pd.DataFrame:
    """images pandas frame -> labels frame (FIXTURES.md §A2)."""
    n = len(pdf)
    cap = pdf["caption"]

    null_bad = (
        pdf["image_id"].isna()
        | cap.isna()
        | pdf["bytes"].isna()
        | pdf["w"].isna() | (pdf["w"] <= 0)
        | pdf["h"].isna() | (pdf["h"] <= 0)
        | pdf["phash"].isna()
    ).to_numpy()

    stats = heuristic_stats(cap)
    too_short = (stats["n_chars"] < MIN_CAPTION_LEN).to_numpy()
    too_long = (stats["n_chars"] > MAX_CAPTION_LEN).to_numpy()
    repetition = stats["repetition_bad"].to_numpy()
    stopword = stats["stopword_bad"].to_numpy()
    symbol = stats["symbol_bad"].to_numpy()

    lid = classify(cap)
    lang_bad = (lid["lang"] == LANG_UND).to_numpy()

    ppl = perplexity(cap)
    ppl_bad = ppl > MAX_PPL

    scrub = scrub_series(cap)
    toxic = scrub["toxic"].to_numpy()

    # decode invariant
    pixel_ok = np.zeros(n, dtype=bool)
    psnr = np.full(n, np.nan)
    for i in range(n):
        b, fmt = pdf["bytes"].iloc[i], pdf["fmt"].iloc[i]
        wv, hv = pdf["w"].iloc[i], pdf["h"].iloc[i]
        if b is None or pd.isna(wv) or pd.isna(hv):
            continue
        w, h = int(wv), int(hv)
        try:
            pix = codecs.decode(b, fmt, w, h)
        except Exception:
            continue
        phv = pdf["phash"].iloc[i]
        ok = (
            pix.shape[0] == h
            and pix.shape[1] == w
            and not pd.isna(phv)
            and codecs.ahash64(pix) == int(phv)
        )
        pixel_ok[i] = ok
        if ok:
            try:
                ref = codecs.decode_ref(b, fmt, pix.shape[1], pix.shape[0])
                psnr[i] = np.inf if ref is None else codecs.psnr_db(pix, ref)
            except Exception:
                pass  # stays NaN; thresholded below

    with np.errstate(invalid="ignore"):
        psnr_ok = psnr >= MIN_PSNR_DB

    # duplicate rank: first image_id per phash wins.  dropna=False
    # mirrors Spark's window semantics, which group null phashes
    # together (second+ null-phash rows are duplicates)
    rank = pdf.groupby("phash", dropna=False)["image_id"].rank(method="first").to_numpy()
    dup = rank > 1

    flags = {
        RULE_NULL: null_bad,
        RULE_TOO_SHORT: too_short,
        RULE_TOO_LONG: too_long,
        RULE_REPETITION: repetition,
        RULE_STOPWORD: stopword,
        RULE_SYMBOL: symbol,
        RULE_LANG: lang_bad,
        RULE_PPL: ppl_bad,
        RULE_TOXIC: toxic,
        # pixel invariant incl. the lossy-format PSNR threshold
        # (BASELINE.json:15); NaN psnr rows already have pixel_ok
        # False, so the NaN comparison (False) cannot flip a verdict
        RULE_PIXEL: ~(pixel_ok & psnr_ok),
        RULE_DUP: dup,
    }
    any_bad = np.zeros(n, dtype=bool)
    for name in RULE_ORDER:
        any_bad |= flags[name]
    reasons = [
        [name for name in RULE_ORDER if flags[name][i]] for i in range(n)
    ]

    return pd.DataFrame({
        "image_id": pdf["image_id"],
        "keep": ~any_bad,
        "drop_reasons": reasons,
        "lang": lid["lang"],
        "lang_conf": lid["lang_conf"],
        "ppl": ppl,
        "caption_scrubbed": scrub["caption_scrubbed"],
        "scrub_hits": scrub["scrub_hits"],
        "pixel_ok": pixel_ok,
        "psnr_db": psnr,
    })
