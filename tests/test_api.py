"""Declarative check-suite API (the reference's namesake capability):
single-pass evaluation, per-check verdicts, hand-computed counts."""

from __future__ import annotations

import pytest

from data_quality_check_spark.api import Suite, checks as C


def test_suite_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 200), (3, None, 5), (3, "c", -1)],
        "id int, name string, v int")
    rep = Suite([
        C.not_null("name"),
        C.unique("id"),
        C.in_range("v", 0, 100),
        C.matches("name", "^[a-c]$"),
        C.accepted_values("name", ["a", "b"]),
        C.expression("v_even", "v % 2 = 0"),
    ]).run(df)
    by = {r.name: r for r in rep.results}
    assert rep.total_rows == 4
    assert by["not_null_name"].violations == 1
    assert by["unique_id"].violations == 1        # id=3 twice
    assert by["in_range_v"].violations == 2       # 200, -1
    assert by["matches_name"].violations == 1     # the null
    assert by["accepted_name"].violations == 2    # 'c' + null
    assert by["v_even"].violations == 2           # 5, -1
    assert not rep.passed


def test_suite_single_job(spark):
    """All checks compile into one aggregate — a second scan would
    show up as a second Exchange/Aggregate pair in the plan."""
    df = spark.range(100).selectExpr("id", "cast(id as string) AS s")
    suite = Suite([C.not_null("s"), C.unique("id"), C.in_range("id", 0, 99)])
    agg = df.agg(*suite.aggregates())
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1  # range scan, single source


def test_suite_passes_clean_images(spark):
    from data_quality_check_spark.sources import images as IM

    df = IM.read_images(spark, 0.001)
    rep = Suite([
        C.unique("image_id"),
        C.matches("image_id", r"img_\d{12}"),
        C.accepted_values("fmt", ["raw", "ppm", "png", "rawq"]),
        C.in_range("w", 1, 10_000),
    ]).run(df)
    assert rep.passed, rep.to_rows()


def test_run_and_log(spark, tmp_path):
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog

    cat = LocalParquetCatalog(spark, str(tmp_path))
    df = spark.range(10).selectExpr("id", "cast(id as string) AS s")
    rep = Suite([C.not_null("s"), C.in_range("id", 0, 5)]).run_and_log(
        df, cat, run_id="r1")
    assert not rep.passed  # ids 6..9 out of range
    logged = cat.read_table("dq_reports").toPandas()
    assert len(logged) == 2
    assert set(logged["check"]) == {"not_null_s", "in_range_id"}
    assert logged.set_index("check").loc["in_range_id", "violations"] == 4


def test_value_based_checks(spark):
    df = spark.range(100).selectExpr(
        "id", "cast(id as double) AS v",
        "CASE WHEN id < 10 THEN NULL ELSE cast(id as string) END AS s")
    rep = Suite([
        C.completeness("s", 0.85),           # 10% null -> pass
        C.completeness("id", 1.0),           # no nulls -> pass
        C.mean_between("v", 49.0, 50.0),     # mean = 49.5
        C.percentile_between("v", 0.5, 49.0, 50.0),  # p50 = 49.5
        C.distinct_count_between("id", 100, 100),
    ]).run(df)
    assert rep.passed, rep.to_rows()
    by = {r.name: r for r in rep.results}
    assert by["mean_v"].value == pytest.approx(49.5)
    assert by["p50_v"].value == pytest.approx(49.5)
    assert by["distinct_id"].value == 100.0

    bad = Suite([
        C.completeness("s", 0.95),           # 10% null -> fail
        C.mean_between("v", 0.0, 10.0),      # fail
    ]).run(df)
    assert not bad.passed
    assert not any(r.passed for r in bad.results)


def test_value_checks_single_pass(spark):
    df = spark.range(1000).selectExpr("id", "cast(id as double) AS v")
    suite = Suite([C.mean_between("v", 0, 1e9),
                   C.percentile_between("v", 0.9, 0, 1e9),
                   C.distinct_count_between("id", 1, 10**9),
                   C.not_null("v")])
    agg = df.agg(*suite.aggregates())
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1


def test_value_checks_empty_table(spark):
    df = spark.range(0).selectExpr("id", "cast(id as double) AS v")
    rep = Suite([C.mean_between("v", 0, 1),
                 C.completeness("v", 0.9)]).run(df)
    by = {r.name: r for r in rep.results}
    assert not by["mean_v"].passed       # no value -> cannot pass
    assert by["completeness_v"].passed   # vacuously complete
