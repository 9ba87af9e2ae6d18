"""PassJoin fuzzy self-join: exactness vs a Python brute force on
constructed populations (boundary distances, exact duplicates, short
strings), segment-geometry invariants, and the no-cross-join plan
shape for the long-string path."""

from __future__ import annotations

import itertools

import pytest

from data_quality_check_spark.operators.fuzzyjoin import fuzzy_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    return {(min(i, j), max(i, j)): _lev(a, b)
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= k}


def _got(spark, rows, k):
    df = spark.createDataFrame(rows, "id long, s string")
    return {(r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy_pairs(df, "s", "id", k=k).collect()}


def test_matches_brute_force_on_mixed_population(spark):
    rows = [
        (1, "goldenrod lavender spring chocolate lace"),
        (2, "goldenrod lavender spring chocolate lace"),   # exact dup
        (3, "goldenrod lavender sprint chocolate lace"),   # ed 1
        (4, "goldenrod lavender spring chocolate"),        # ed 5 (out)
        (5, "goldenrod lavendar sprint chocolate lace"),   # ed 2
        (6, "moccasin powder blanched rosy beige"),
        (7, "moccasin powder blanched rose beige"),        # ed 1 of 6
        (8, "xx"),                                         # short
        (9, "xy"),                                         # short, ed 1
        (10, "x"),                                         # short, ed 1 of 8/9
    ]
    for k in (1, 2):
        assert _got(spark, rows, k) == _brute(rows, k), k


def test_boundary_distance_exactly_k(spark):
    # two edits exactly: substitution at both ends
    rows = [(1, "abcdefghijkl"), (2, "zbcdefghijkz")]
    assert _got(spark, rows, 2) == {(1, 2): 2}
    assert _got(spark, rows, 1) == {}


def test_length_difference_k_is_found(spark):
    # pure insertions: length differs by exactly k
    rows = [(1, "abcdefghij"), (2, "abcdefghijXY")]
    assert _got(spark, rows, 2) == {(1, 2): 2}


def test_exact_dup_groups_expand_all_pairs(spark):
    rows = [(i, "same exact name here") for i in range(1, 5)]
    got = _got(spark, rows, 2)
    assert got == {(a, b): 0
                   for a, b in itertools.combinations(range(1, 5), 2)}


def test_long_path_plan_has_no_cartesian(spark):
    # all strings >= k+1 chars: the short-string band join is empty
    # and the plan must not contain a cross/theta join
    rows = [(i, f"prefix word number {i:04d} suffix") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, s string")
    plan = fuzzy_pairs(df, "s", "id", k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_null_strings_ignored(spark):
    rows = [(1, "abcdef"), (2, None), (3, "abcdefg")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_pairs(df, "s", "id", k=2).collect()}
    assert got == {(1, 3): 1}


@pytest.mark.parametrize("k", [1, 2, 3])
def test_segment_geometry_covers_string(spark, k):
    """Segments must tile [0, len) exactly for every length/k."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators.fuzzyjoin import _seg_geometry

    m = k + 1
    lens = spark.range(m, 40).select(F.col("id").cast("int").alias("l"))
    segs = lens.select("l", F.explode(F.sequence(
        F.lit(0), F.lit(k))).alias("i"))
    st, ln = _seg_geometry(F.col("l"), F.col("i"), m)
    out = segs.select("l", "i", st.alias("st"), ln.alias("ln")) \
              .orderBy("l", "i").collect()
    by_l: dict[int, list] = {}
    for r in out:
        by_l.setdefault(r["l"], []).append((r["st"], r["ln"]))
    for l, parts in by_l.items():
        pos = 0
        for st_, ln_ in parts:
            assert st_ == pos, (l, parts)
            assert ln_ >= 1
            pos += ln_
        assert pos == l, (l, parts)
