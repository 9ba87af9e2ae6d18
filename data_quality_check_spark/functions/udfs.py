"""Vectorized pandas/Arrow UDFs (SURVEY.md §2 O-10..O-13).

All four UDFs are batched Arrow transfers — no per-row Python at the
Spark level (BASELINE.json:15).  The scalar-iterator form is used so
models (langid bigram tensor, perplexity trigram tensor, compiled
regexes) are touched once per Python worker, not once per batch
element.  The actual math lives in kernels/* and is shared verbatim
with the pandas oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# StructType objects (not DDL strings): DDL parsing at decoration time
# would require an active SparkSession at import.
LANGID_SCHEMA = StructType([
    StructField("lang", StringType()),
    StructField("lang_conf", DoubleType()),
])
SCRUB_SCHEMA = StructType([
    StructField("caption_scrubbed", StringType()),
    StructField("scrub_hits", MapType(StringType(), IntegerType())),
    StructField("toxic", BooleanType()),
])
DECODE_SCHEMA = StructType([
    StructField("pixel_ok", BooleanType()),
    StructField("psnr_db", DoubleType()),
    StructField("w_real", IntegerType()),
    StructField("h_real", IntegerType()),
    StructField("phash_real", LongType()),
])


@pandas_udf(LANGID_SCHEMA)
def langid_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    from ..kernels.langid import classify  # model built once per worker

    for captions in it:
        yield classify(captions.fillna(""))


@pandas_udf(DoubleType())
def ppl_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from ..kernels.ppl import perplexity

    for captions in it:
        yield pd.Series(perplexity(captions.fillna("")))


@pandas_udf(SCRUB_SCHEMA)
def scrub_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    from ..kernels.scrub import scrub_series

    for captions in it:
        yield scrub_series(captions)


@pandas_udf(DECODE_SCHEMA)
def decode_udf(
    it: Iterator[tuple[pd.Series, pd.Series, pd.Series, pd.Series, pd.Series]],
) -> Iterator[pd.DataFrame]:
    """(bytes, fmt, w, h, phash) -> decode-invariant verdict.

    Per-image numpy decode inside an Arrow batch; PSNR is taken
    against the reference decode, which for the lossless sandbox
    formats is the same pixels => inf dB (BASELINE.json:15 threshold
    of 40 dB applies to lossy formats on real clusters).
    """
    from ..kernels import codecs

    for blob, fmt, w, h, phash in it:
        n = len(blob)
        ok = np.zeros(n, dtype=bool)
        psnr = np.full(n, np.nan)
        w_real = np.zeros(n, dtype=np.int32)
        h_real = np.zeros(n, dtype=np.int32)
        ph_real = np.zeros(n, dtype=np.int64)
        for i in range(n):
            b = blob.iloc[i]
            if b is None:
                continue
            try:
                pix = codecs.decode(b, fmt.iloc[i], int(w.iloc[i]), int(h.iloc[i]))
            except Exception:
                continue
            h_real[i], w_real[i] = pix.shape[0], pix.shape[1]
            ph_real[i] = codecs.ahash64(pix)
            ok[i] = (
                h_real[i] == int(h.iloc[i])
                and w_real[i] == int(w.iloc[i])
                and ph_real[i] == int(phash.iloc[i])
            )
            if ok[i]:
                psnr[i] = np.inf
        yield pd.DataFrame({
            "pixel_ok": ok,
            "psnr_db": psnr,
            "w_real": w_real,
            "h_real": h_real,
            "phash_real": ph_real,
        })
