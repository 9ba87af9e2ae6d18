"""Structured-PII validation beyond regex hits.

The scrub kernel (kernels/scrub.py) masks anything that LOOKS like an
identifier; production pipelines additionally CHECKSUM-validate the
candidates so a phone number or order id isn't reported (or redacted)
as a payment card.  This module implements the classic example — Luhn
mod-10 validation of card-shaped digit runs — entirely in JVM
expressions: regexp candidate extraction, digit normalization, a
positional explode and one counts-only aggregation.  No Python in the
plan, no payload columns through the shuffle (the exploded rows carry
(id, candidate, one digit, position) only), and the aggregation
partial-combines map-side, so the plan's shuffle volume is
~2 ints per candidate digit regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CARD_SHAPE = r"[0-9][0-9 \-]{10,17}[0-9]"


def luhn_card_report(df: DataFrame, id_col: str = "image_id",
                     text_col: str = "caption") -> DataFrame:
    """One row per card-shaped digit run: (id, masked tail, digit
    count, luhn_ok, valid).  `valid` = Luhn checksum passes AND the
    digit count is a real card length (13-19) — the gate that keeps
    10-digit phone numbers and short order ids out of the
    payment-card bucket.  The raw candidate is never emitted, only
    the masked last-4 (PII hygiene in the REPORT itself)."""
    # posexplode: the candidate INDEX keys the aggregation so two
    # identical runs in one text stay two candidates (a plain explode
    # + groupBy(seq) would merge them and double their digit sums)
    seqs = df.select(
        F.col(id_col),
        F.posexplode(F.expr(
            f"regexp_extract_all({text_col}, '{CARD_SHAPE}', 0)"))
        .alias("cidx", "seq"))
    norm = seqs.select(
        id_col, "cidx", "seq",
        F.translate("seq", " -", "").alias("digits"))
    # digits of the REVERSED run: Luhn doubles every second digit
    # from the right, so reversing first makes the parity positional
    ch = norm.select(
        id_col, "cidx", "digits",
        F.posexplode(F.expr(
            "regexp_extract_all(reverse(digits), '[0-9]', 0)"))
        .alias("pos", "ch"))
    d = F.col("ch").cast("int")
    dbl = d * 2
    contrib = F.when(F.col("pos") % 2 == 1,
                     dbl - F.when(dbl > 9, F.lit(9)).otherwise(F.lit(0))
                     ).otherwise(d)
    agg = (ch.groupBy(id_col, "cidx", "digits")
           .agg(F.sum(contrib).alias("__s"),
                F.count("*").alias("n_digits")))
    luhn_ok = (F.col("__s") % 10 == 0)
    return agg.select(
        id_col,
        F.concat(F.lit("****"), F.substring("digits", -4, 4))
        .alias("masked"),
        F.col("n_digits").cast("int").alias("n_digits"),
        luhn_ok.alias("luhn_ok"),
        (luhn_ok & F.col("n_digits").between(13, 19)).alias("valid"))
