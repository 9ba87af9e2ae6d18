"""Edit-distance (fuzzy) self-join with PassJoin segment filtering.

Finds all pairs of rows whose string column is within Levenshtein
distance k — the classic entity-resolution / near-key-matching
operator — WITHOUT the all-pairs cross join.  Algorithm is the
public PassJoin family (Li, Deng & Feng, ICDE 2011):

* partition each string into k+1 contiguous segments (even split,
  the last ``len % (k+1)`` segments one char longer);
* pigeonhole: ed(s, t) <= k means some segment of s has ZERO edits,
  so it appears VERBATIM in t, shifted by at most the edits that
  precede it (<= k).  Candidates are therefore exact matches between
  s's segments and t's substrings of the same length at positions
  within +-k of the segment start — an equi-join, never a theta join;
* verify candidates with one levenshtein() call per distinct pair.

EXACT recall: the pigeonhole covers every pair in both directions, so
candidates are generated with both role assignments and canonicalized
(least/greatest) — no probabilistic miss, value-checkable against a
brute-force oracle.

Scale shape (10^12 rows): exact-duplicate strings are collapsed FIRST
(the dedup_phash_hamming_distinct lesson — identical hot strings
would otherwise k^2-blow-up the segment join); the segment index and
the probe table carry (hash, len, seg_idx, segment) scalar rows only;
the equi-join shuffles on (len, seg_idx, segment), so fan-out per key
is the number of distinct strings sharing that exact substring —
bounded the way an inverted index is.  Strings are fetched for
verification by semi-join-pruned hash joins; id expansion at the end
is output-sized by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_geometry(l_col, i_col, m: int):
    """(length, segment index) -> (start, seg_len) for the even split
    where the last ``l % m`` segments take the extra char."""
    base = F.floor(l_col / m).cast("int")
    rem = (l_col % m).cast("int")
    extra_before = F.greatest(F.lit(0), i_col - (F.lit(m) - rem))
    start = i_col * base + extra_before
    seg_len = base + (i_col >= (F.lit(m) - rem)).cast("int")
    return start, seg_len


def fuzzy_pairs(df: DataFrame, text_col: str, id_col: str,
                k: int = 2) -> DataFrame:
    """All (id_a, id_b, dist) with id_a < id_b and
    levenshtein(text_a, text_b) <= k.  Exact (PassJoin candidates +
    verify); strings shorter than k+1 chars fall back to a
    length-banded join within their own tiny population."""
    m = k + 1
    ids = df.select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("s")).filter(F.col("s").isNotNull())
    uniq = (ids.select("s").distinct()
            .select(F.xxhash64("s").alias("h"), "s",
                    F.length("s").alias("l")))

    # ---- segment index over long-enough strings -------------------------
    long_u = uniq.filter(F.col("l") >= m)
    idx = long_u.select("h", "l", "s",
                        F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"))
    st, ln = _seg_geometry(F.col("l"), F.col("i"), m)
    idx = idx.select("h", "l", "i",
                     F.col("s").substr(st + 1, ln).alias("seg"))

    # ---- probe: substrings of t at segment geometry of any candidate
    # length l2 in [len(t)-k, len(t)+k], position window +-k ---------------
    prb = long_u.select(
        "h", "s", F.col("l").alias("tl"),
        F.explode(F.sequence(F.col("l") - k, F.col("l") + k)).alias("l"))
    prb = prb.filter(F.col("l") >= m)
    prb = prb.select("h", "s", "tl", "l",
                     F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"))
    st2, ln2 = _seg_geometry(F.col("l"), F.col("i"), m)
    prb = prb.select(
        "h", "s", "l", "i", ln2.alias("ln"),
        F.greatest(F.lit(0), st2 - k).alias("lo"),
        F.least(F.col("tl") - ln2, st2 + k).alias("hi"))
    prb = prb.filter(F.col("hi") >= F.col("lo"))
    prb = prb.select("h", "s", "l", "i", "ln",
                     F.explode(F.sequence("lo", "hi")).alias("p"))
    prb = prb.select("h", "l", "i",
                     F.col("s").substr(F.col("p") + 1, F.col("ln"))
                     .alias("seg"))

    cand = (idx.alias("a")
            .join(prb.alias("b"), ["l", "i", "seg"])
            .filter(F.col("a.h") != F.col("b.h"))
            .select(F.least("a.h", "b.h").alias("ha"),
                    F.greatest("a.h", "b.h").alias("hb"))
            .distinct())

    # ---- short-string fallback: strings with < m chars can't host m
    # non-empty segments; they are a tiny population.  The length band
    # |la - lb| <= k is expressed as an EQUI-join by exploding the
    # short side's candidate lengths (2k+1 rows each), so the plan
    # never contains a theta/cartesian node even when this branch is
    # empty ---------------------------------------------------------------
    short_u = uniq.filter(F.col("l") < m)
    short_exp = short_u.select(
        F.col("h").alias("sh"),
        F.explode(F.sequence(F.greatest(F.col("l") - k, F.lit(1)),
                             F.col("l") + k)).alias("l"))
    short_cand = (short_exp
                  .join(uniq.select("h", "l"), "l")
                  .filter(F.col("sh") != F.col("h"))
                  .select(F.least("sh", "h").alias("ha"),
                          F.greatest("sh", "h").alias("hb"))
                  .distinct())
    cand = cand.union(short_cand).distinct()

    # ---- verify on distinct-string pairs --------------------------------
    cand_ids = (cand.select(F.col("ha").alias("ch"))
                .union(cand.select(F.col("hb").alias("ch"))).distinct())
    strs = uniq.select(F.col("h").alias("ch"), "s") \
               .join(cand_ids, "ch", "left_semi")
    verified = (
        cand.join(strs.select(F.col("ch").alias("ha"),
                              F.col("s").alias("sa")), "ha")
        .join(strs.select(F.col("ch").alias("hb"),
                          F.col("s").alias("sb")), "hb")
        .select("ha", "hb", "sa", "sb",
                F.levenshtein("sa", "sb").alias("dist"))
        .filter(F.col("dist") <= k))

    # ---- expand distinct-string pairs back to id pairs ------------------
    # Joins include the string alongside its hash so a 64-bit xxhash64
    # collision between distinct values can never attach the wrong id
    # to a verified pair (hash is the shuffle key, string is the tie-
    # breaker; the extra bytes only travel for candidate-surviving
    # rows).
    hid = ids.select(F.xxhash64("s").alias("h"), "s", "id")
    cross = (verified
             .join(hid.select(F.col("h").alias("ha"),
                              F.col("s").alias("sa"),
                              F.col("id").alias("ia")), ["ha", "sa"])
             .join(hid.select(F.col("h").alias("hb"),
                              F.col("s").alias("sb"),
                              F.col("id").alias("ib")), ["hb", "sb"])
             .select(F.least("ia", "ib").alias("id_a"),
                     F.greatest("ia", "ib").alias("id_b"), "dist"))
    # Exact branch: hash-pruned self-join, then VERIFY with the real
    # strings — equal strings keep dist 0; a colliding near-pair (same
    # h, different s, ed <= k) is caught here because the candidate
    # path's a.h != b.h filter excludes it; a colliding far pair is
    # filtered by the distance gate.  The equality short-circuit
    # matters: on exact-dup-heavy inputs this branch emits c^2/2
    # pairs per repeated value (3.1M at sf0.1's 64-name part pool),
    # and levenshtein is a full O(len^2) DP even for equal strings —
    # unconditionally verifying cost 6 s where the string-equals
    # codegen compare is O(len) (measured 9.7 -> 3.7 s on the
    # join_fuzzy key); only genuine 64-bit collisions pay the DP.
    same = (hid.alias("a")
            .join(hid.alias("b"),
                  (F.col("a.h") == F.col("b.h"))
                  & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.when(F.col("a.s") == F.col("b.s"), F.lit(0))
                    .otherwise(F.levenshtein("a.s", "b.s"))
                    .alias("dist"))
            .filter(F.col("dist") <= k))
    return cross.union(same)
