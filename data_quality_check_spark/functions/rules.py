"""Heuristic quality rules as pure Column expressions (SURVEY.md §2
O-6..O-9; BASELINE.json:6 "heuristic quality rules (length,
repetition, stopword ratio, symbol density) expressed as vectorized
DataFrame column expressions").

No Python UDFs here: everything compiles into whole-stage codegen.
Semantics mirror kernels/text.py::heuristic_stats exactly
(tokenize = split on single space, drop empties); the parity test is
tests/test_pipeline_vs_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import (
    ALLOWED_CHAR_CLASS,
    MAX_CAPTION_LEN,
    MAX_SYMBOL_DENSITY,
    MIN_CAPTION_LEN,
    MIN_DISTINCT_TOKEN_RATIO,
    MIN_STOPWORD_RATIO,
    STOPWORD_MIN_TOKENS,
    STOPWORD_SET,
    SYMBOL_CHAR_CLASS,
)

def _stop_lit() -> Column:
    # built lazily: Column construction needs an active SparkContext
    return F.array(*[F.lit(w) for w in STOPWORD_SET])


def caption_norm(caption: Column) -> Column:
    """Null-safe caption (null -> '' for rule math; nullness itself is
    the null_fields rule)."""
    return F.coalesce(caption, F.lit(""))


def tokens(cap: Column) -> Column:
    return F.filter(F.split(cap, " "), lambda t: t != F.lit(""))


def n_chars(cap: Column) -> Column:
    return F.length(cap)


def null_fields_bad(df_cols: dict[str, Column]) -> Column:
    # w/h/phash nullness checked explicitly: (NULL <= 0) is NULL in
    # SQL (and NaN <= 0 is False in pandas), so without isNull() the
    # Spark flag and the oracle would diverge on null dimensions
    return (
        df_cols["image_id"].isNull()
        | df_cols["caption"].isNull()
        | df_cols["bytes"].isNull()
        | df_cols["w"].isNull() | (df_cols["w"] <= 0)
        | df_cols["h"].isNull() | (df_cols["h"] <= 0)
        | df_cols["phash"].isNull()
    )


def too_short_bad(cap: Column) -> Column:
    return n_chars(cap) < MIN_CAPTION_LEN


def too_long_bad(cap: Column) -> Column:
    return n_chars(cap) > MAX_CAPTION_LEN


def distinct_ratio(toks: Column) -> Column:
    nt = F.size(toks)
    return F.when(
        nt > 0, F.size(F.array_distinct(toks)).cast("double") / nt
    ).otherwise(F.lit(1.0))


def repetition_bad(toks: Column) -> Column:
    return (F.size(toks) > 0) & (distinct_ratio(toks) < MIN_DISTINCT_TOKEN_RATIO)


def stopword_ratio(toks: Column) -> Column:
    nt = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(_stop_lit(), t)))
    return F.when(nt > 0, n_stop.cast("double") / nt).otherwise(F.lit(0.0))


def stopword_bad(toks: Column) -> Column:
    return (F.size(toks) >= STOPWORD_MIN_TOKENS) & (
        stopword_ratio(toks) < MIN_STOPWORD_RATIO
    )


def symbol_density(cap: Column) -> Column:
    # strip the ALLOWED chars and count what's left: Java regex runs
    # a negated unicode class ~10x slower than the positive class, so
    # this formulation is the fast one (verified identical counts)
    nc = F.length(cap)
    n_sym = F.length(F.regexp_replace(cap, ALLOWED_CHAR_CLASS, ""))
    return F.when(nc > 0, n_sym.cast("double") / nc).otherwise(F.lit(0.0))


def symbol_bad(cap: Column) -> Column:
    return symbol_density(cap) > MAX_SYMBOL_DENSITY
