"""As-of join semantics: latest-at-or-before matching, strict mode,
tie-breaking, and left rows with no match (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_quality_check_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(10)), (3, 10, _ts(2)),
         (4, 20, _ts(7)), (5, 30, _ts(1))],
        "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(3), 1.0), (10, _ts(10), 2.0),
         (20, _ts(7), 5.0), (20, _ts(6), 4.0)],
        "k long, ts timestamp, v double")
    return left, right


def test_asof_latest_at_or_before(spark):
    left, right = _fixture(spark)
    got = {r["lid"]: r["v"] for r in
           asof_join(left, right, "k", "ts", ["v"]).collect()}
    assert got == {
        1: 1.0,   # ts=5 -> right ts=3
        2: 2.0,   # ts=10 -> right ts=10 (equal ts visible)
        3: None,  # ts=2 precedes every right row -> LEFT null
        4: 5.0,   # ts=7 -> right ts=7 beats ts=6
        5: None,  # key 30 has no right rows at all
    }


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _fixture(spark)
    got = {r["lid"]: r["v"] for r in
           asof_join(left, right, "k", "ts", ["v"], strict=True).collect()}
    # lid=2: equal-ts right row no longer visible -> falls back to ts=3
    # lid=4: equal-ts ts=7 excluded -> ts=6
    assert got[2] == 1.0 and got[4] == 4.0


def test_asof_tie_latest_seq_wins(spark):
    left = spark.createDataFrame([(1, 10, _ts(5))],
                                 "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(5), 1.0, 7), (10, _ts(5), 9.0, 8)],
        "k long, ts timestamp, v double, seq long")
    out = asof_join(left, right, "k", "ts", ["v"], seq_col="seq").collect()
    assert out[0]["v"] == 9.0


def test_asof_single_shuffle_plan(spark):
    """The union-window plan must shuffle exactly once — the whole
    point vs the quadratic range-join formulation."""
    left, right = _fixture(spark)
    plan = asof_join(left, right, "k", "ts", ["v"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def test_asof_preserves_left_rowcount(spark):
    left, right = _fixture(spark)
    # LEFT semantics: one output row per left row, always
    assert asof_join(left, right, "k", "ts", ["v"]).count() == left.count()
    assert (asof_join(left.repartition(7), right, "k", "ts", ["v"]).count()
            == left.count())


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized parity against an INDEPENDENT oracle: pandas
    merge_asof (backward direction) — 400 left x 300 right rows,
    multiple keys, duplicate left timestamps, keys missing on either
    side.  Right (key, ts) are unique so both engines share a
    deterministic answer; both modes (at-or-before / strictly-before)
    checked."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    left = pd.DataFrame({
        "lid": np.arange(400),
        "k": rng.integers(0, 8, 400),
        "ts": rng.integers(0, 500, 400),
    })
    rpairs = set()
    while len(rpairs) < 300:
        rpairs.add((int(rng.integers(0, 10)), int(rng.integers(0, 500))))
    right = pd.DataFrame(sorted(rpairs), columns=["k", "ts"])
    right["v"] = rng.normal(size=len(right)).round(6)

    ldf = spark.createDataFrame(left.astype({"lid": "int64", "k": "int64",
                                             "ts": "int64"}))
    rdf = spark.createDataFrame(right.astype({"k": "int64", "ts": "int64"}))

    for strict in (False, True):
        got = {r["lid"]: r["v"] for r in asof_join(
            ldf, rdf, "k", "ts", ["v"], strict=strict).collect()}
        want_df = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="k", direction="backward",
            allow_exact_matches=not strict)
        want = dict(zip(want_df["lid"], want_df["v"]))
        assert len(got) == len(left)
        for lid in want:
            g, w = got[lid], want[lid]
            assert (g is None and pd.isna(w)) or g == w, (strict, lid, g, w)


def test_asof_null_right_value_not_skipped(spark):
    """A right row whose value is legitimately NULL must still win as
    the latest match — per-column last(ignorenulls) would skip it and
    carry an older row's value forward (ADVICE r2).  With multiple
    value columns, ALL attached values must come from that single
    latest right row."""
    left = spark.createDataFrame([(1, 10, _ts(9))],
                                 "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(3), 1.0, "old"), (10, _ts(8), None, "new")],
        "k long, ts timestamp, v double, tag string")
    out = asof_join(left, right, "k", "ts", ["v", "tag"]).collect()[0]
    assert out["v"] is None and out["tag"] == "new"

    # all-NULL latest row: still matched as a row, both fields NULL
    right2 = spark.createDataFrame(
        [(10, _ts(3), 1.0, "old"), (10, _ts(8), None, None)],
        "k long, ts timestamp, v double, tag string")
    out2 = asof_join(left, right2, "k", "ts", ["v", "tag"]).collect()[0]
    assert out2["v"] is None and out2["tag"] is None
