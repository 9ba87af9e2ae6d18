"""Parity of kernels/xxh64.py vs the engine's F.xxhash64 — the kernel
that lets driver-side oracles value-pin engine-hash-valued outputs
(MinHash band hashes, SimHash bits).

Covers every code path: string tails of all lengths mod 8 (and the
>= 32-byte stripe loop), multi-byte UTF-8, longs across the signed
range, ints, and multi-column chains (long,int) / (long,long,long,
long) exactly as minhash densification / band hashing use them.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from data_quality_check_spark.kernels.xxh64 import (hash_int, hash_long,
                                                    hash_string, xxhash64)


def _rnd_strings() -> list[str]:
    rng = random.Random(20260819)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789 _-é中\U0001f600"
    out = [""]
    for n in range(1, 40):  # every tail-length class incl >=32 stripes
        out.append("".join(rng.choice(alpha) for _ in range(n)))
    for n in (63, 64, 65, 100, 257):
        out.append("".join(rng.choice(alpha) for _ in range(n)))
    return out


def test_string_parity(spark):
    vals = _rnd_strings()
    df = spark.createDataFrame(
        [(v,) for v in vals],
        StructType([StructField("s", StringType())]))
    got = {r["s"]: r["h"]
           for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == hash_string(v), repr(v)


def test_long_parity(spark):
    rng = random.Random(7)
    vals = ([0, 1, -1, 2**63 - 1, -2**63, 42]
            + [rng.randrange(-2**63, 2**63) for _ in range(50)])
    df = spark.createDataFrame(
        [(v,) for v in vals], StructType([StructField("v", LongType())]))
    got = {r["v"]: r["h"]
           for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == hash_long(v), v


def test_int_parity(spark):
    rng = random.Random(11)
    vals = ([0, 1, -1, 2**31 - 1, -2**31]
            + [rng.randrange(-2**31, 2**31) for _ in range(50)])
    df = spark.createDataFrame(
        [(v,) for v in vals], StructType([StructField("v", IntegerType())]))
    got = {r["v"]: r["h"]
           for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == hash_int(v), v


def test_chain_parity(spark):
    """(long, int) and 4-long chains — the exact shapes minhash
    densification (xxhash64(gmin, bin_idx)) and band hashing
    (xxhash64(sig[4b..4b+3])) evaluate."""
    rng = random.Random(13)
    rows = [(rng.randrange(-2**63, 2**63), rng.randrange(0, 16),
             *(rng.randrange(-2**63, 2**63) for _ in range(4)))
            for _ in range(40)]
    schema = StructType([
        StructField("g", LongType()), StructField("i", IntegerType()),
        *(StructField(f"s{k}", LongType()) for k in range(4))])
    df = spark.createDataFrame(rows, schema)
    out = df.select(
        "*",
        F.xxhash64("g", "i").alias("h2"),
        F.xxhash64("s0", "s1", "s2", "s3").alias("h4")).collect()
    for r in out:
        assert r["h2"] == xxhash64(("long", r["g"]), ("int", r["i"]))
        assert r["h4"] == xxhash64(r["s0"], r["s1"], r["s2"], r["s3"])


def test_fixture_twin_matches_operator(spark):
    """End-to-end: the pure-Python minhash signature twin equals the
    engine's minhash_signatures on a small doc sample."""
    from data_quality_check_spark.operators.dedup import minhash_signatures
    from data_quality_check_spark.oracle_fixtures import _minhash_sig_py

    texts = ["the quick brown fox jumps over the lazy dog",
             "THE QUICK BROWN FOX", "x", "", "café con leche",
             "a b " * 50]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: list(r["sig"])
           for r in minhash_signatures(df, "text", "doc_id").collect()}
    for i, t in enumerate(texts):
        assert got[i] == _minhash_sig_py(t), (i, t)
