"""Table-level DQ analyzers (operators/dq.py): semantics on edge
cases the SQL-oracle contract fixtures don't exercise — null FKs,
orphans, constant columns for PSI binning, empty groups."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_quality_check_spark.operators.dq import (
    distribution_drift_psi,
    freshness,
    iqr_outliers,
    referential_integrity,
)


def test_referential_orphans_and_null_fks(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (2,)], "pk int")
    row = referential_integrity(child, parent, "fk", "pk",
                                "t").collect()[0]
    assert row["total"] == 4
    assert row["orphans"] == 1        # 99 has no parent
    assert row["null_fks"] == 1       # NULL fk reported separately
    assert row["ok"] is False

    clean = spark.createDataFrame([(1,), (2,)], "fk int")
    assert referential_integrity(clean, parent, "fk", "pk",
                                 "t").collect()[0]["ok"] is True


def test_psi_identical_populations_is_zero(spark):
    # same value multiset on both sides (pairs 2k/2k+1 share a value)
    # -> every psi_term == 0 exactly
    rows = [(i, float((i // 2) % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = distribution_drift_psi(df, "v", F.col("id") % 2 == 0,
                                 bins=5).collect()
    assert sum(abs(r["psi_term"]) for r in out) == 0.0
    assert sum(r["n_base"] for r in out) == 100


def test_psi_constant_column_single_bin(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(10)],
                               "id long, v double")
    out = distribution_drift_psi(df, "v", F.col("id") < 5).collect()
    assert len(out) == 1 and out[0]["bin"] == 0


def test_psi_detects_shift(spark):
    rows = ([(i, 0.0, True) for i in range(100)]
            + [(i + 100, 9.0, False) for i in range(100)])
    df = spark.createDataFrame(rows, "id long, v double, base boolean")
    out = distribution_drift_psi(df, "v", F.col("base"), bins=10)
    psi = sum(r["psi_term"] for r in out.collect())
    assert psi > 0.2  # the conventional drift threshold


def test_iqr_outliers_flags_extremes(spark):
    vals = [float(v) for v in range(1, 12)] + [1000.0]
    df = spark.createDataFrame([("a", v) for v in vals],
                               "event_type string, value double")
    row = iqr_outliers(df, "value", "event_type").collect()[0]
    assert row["total"] == 12 and row["outliers"] == 1
    assert row["fence_hi"] < 1000.0


def test_freshness_lag_and_staleness(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [("fresh", t0), ("stale", t0 - dt.timedelta(hours=3))],
        "event_type string, ts timestamp")
    out = {r["event_type"]: r for r in
           freshness(df, "ts", "event_type", 3600.0).collect()}
    assert out["fresh"]["lag_seconds"] == 0.0
    assert out["fresh"]["stale"] is False
    assert math.isclose(out["stale"]["lag_seconds"], 10800.0)
    assert out["stale"]["stale"] is True


def test_merge_upsert_null_values_classified_by_presence(spark):
    """Action classification must come from side-presence markers,
    not value-column null patterns: a source row carrying NULL values
    is still an update/insert."""
    from data_quality_check_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k int, v double")
    source = spark.createDataFrame(
        [(2, None), (3, None)], "k int, v double")
    out = {r["k"]: r for r in
           merge_upsert(target, source, "k", ["v"]).collect()}
    assert out[1]["action"] == "keep" and out[1]["v"] == 10.0
    assert out[2]["action"] == "update" and out[2]["v"] is None
    assert out[3]["action"] == "insert" and out[3]["v"] is None


def test_table_diff_null_transitions_are_changes(spark):
    from data_quality_check_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0), (4, 4.0)], "k int, v double")
    new = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None), (5, 5.0)], "k int, v double")
    out = {r["k"]: r["change"] for r in
           table_diff(old, new, "k", ["v"]).collect()}
    # k=1 unchanged -> absent; NULL<->value transitions are changes
    assert 1 not in out
    assert out == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_boilerplate_fraction(spark):
    from data_quality_check_spark.operators.corpus import (
        boilerplate_fraction)

    shared = "the quick brown fox jumps over lazy dogs"
    rows = [(i, shared) for i in range(3)]          # shared 5-grams
    rows.append((10, "completely unique words here appearing once only"))
    rows.append((11, "xx"))                          # < 5 tokens: 0 grams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in boilerplate_fraction(
        df, "text", "doc_id", n=5, min_doc_freq=3).collect()}
    assert out[0]["boiler_frac"] == 1.0 and out[0]["n_grams"] == 4
    assert out[10]["boiler_frac"] == 0.0
    assert 11 not in out  # no grams -> no row


def test_scd2_history_collapses_noops_and_builds_intervals(spark):
    """SCD-2: consecutive equal values collapse into one interval;
    value flips reopen; NULL transitions are null-safe; the latest
    interval is open (is_current)."""
    from datetime import datetime

    from data_quality_check_spark.operators.cdc import scd2_history

    t = [datetime(2026, 1, d) for d in range(1, 8)]
    rows = [
        ("u1", t[0], "A", 1), ("u1", t[1], "A", 2),   # no-op: collapse
        ("u1", t[2], "B", 3), ("u1", t[3], "B", 4),   # flip then no-op
        ("u1", t[4], "A", 5),                          # back to A: new row
        ("u2", t[0], None, 6), ("u2", t[1], None, 7),  # null-safe no-op
        ("u2", t[2], "X", 8),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string, "
              "event_id long")
    out = {(r["user_id"], r["valid_from"]):
           (r["event_type"], r["valid_to"], r["is_current"])
           for r in scd2_history(df, "user_id", "ts", "event_type",
                                 seq_col="event_id").collect()}
    assert out == {
        ("u1", t[0]): ("A", t[2], False),
        ("u1", t[2]): ("B", t[4], False),
        ("u1", t[4]): ("A", None, True),
        ("u2", t[0]): (None, t[2], False),
        ("u2", t[2]): ("X", None, True),
    }


def test_scd2_history_single_exchange(spark):
    """Both windows partition on the same key: the physical plan must
    contain exactly ONE shuffle."""
    from data_quality_check_spark.operators.cdc import scd2_history

    df = spark.createDataFrame([("u", 1.0, "A", 1)],
                               "user_id string, ts double, "
                               "event_type string, event_id long")
    plan = scd2_history(df, "user_id", "ts", "event_type",
                        "event_id")._jdf.queryExecution().executedPlan() \
        .toString()
    assert plan.count("Exchange") == 1, plan


def test_profile_drift_flags_null_regression_only(spark):
    """A NULL-injection regression on one column must flag that
    column and leave untouched columns quiet; a mean shift beyond
    10% relative flags a numeric column."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators.dq import profile_drift

    old = spark.createDataFrame(
        [(i, f"t{i}", float(i % 10)) for i in range(100)],
        "id long, txt string, val double")
    new = (old.withColumn("txt", F.when(F.col("id") % 4 == 0, None)
                          .otherwise(F.col("txt")))
           .withColumn("val", F.col("val") * 2.0))
    out = {r["column"]: r for r in profile_drift(
        old, new, ["id", "txt", "val"]).collect()}
    assert out["txt"]["drifted"] and out["txt"]["null_frac_delta"] == 0.25
    assert out["val"]["drifted"] and out["val"]["mean_delta"] == 4.5
    assert not out["id"]["drifted"]
    assert out["id"]["null_frac_delta"] == 0.0
    assert out["txt"]["distinct_delta"] == -25
