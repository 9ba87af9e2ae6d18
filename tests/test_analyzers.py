"""Semantic invariants for the round-3 third-wave analyzer keys
(threshold ROC, Wilson CI, embedding drift, pixel-stat histogram).
Value-exactness vs DuckDB is covered by test_queries_contract; these
check the STATISTICS mean what they claim."""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


def test_ppl_roc_monotone_and_consistent(spark):
    """Raising the ppl cutoff can only admit more rows: tp and fp are
    nondecreasing in the threshold, fn nonincreasing, and tp+fn (the
    positive count) is constant across the sweep."""
    from data_quality_check_spark.queries import q_agg_ppl_roc

    pdf = (q_agg_ppl_roc(spark, SF01_DIR).toPandas()
           .sort_values("ppl_threshold").reset_index(drop=True))
    assert (pdf.tp.diff().dropna() >= 0).all()
    assert (pdf.fp.diff().dropna() >= 0).all()
    assert (pdf.fn.diff().dropna() <= 0).all()
    assert pdf.eval("tp + fn").nunique() == 1
    # recall hits its max at the loosest threshold; precision/recall
    # reproduce the count arithmetic
    row = pdf.iloc[-1]
    assert row.recall == pytest.approx(
        row.tp / (row.tp + row.fn), abs=1e-6)
    assert row.precision == pytest.approx(
        row.tp / (row.tp + row.fp), abs=1e-6)


def test_keep_rate_ci_brackets_rate(spark):
    """Wilson interval: ci_low <= keep_rate <= ci_high, bounds inside
    [0, 1], and a bigger stratum gets a narrower interval at a
    comparable rate (the und stratum is rate 0 -> its interval still
    has positive width)."""
    from data_quality_check_spark.queries import q_agg_keep_rate_ci

    pdf = q_agg_keep_rate_ci(spark, SF01_DIR).toPandas()
    assert len(pdf) >= 2
    assert (pdf.ci_low <= pdf.keep_rate + 1e-9).all()
    assert (pdf.keep_rate <= pdf.ci_high + 1e-9).all()
    assert (pdf.ci_low >= 0).all() and (pdf.ci_high <= 1).all()
    assert ((pdf.ci_high - pdf.ci_low) > 0).all()
    # spot-check the Wilson math on one row
    r = pdf.iloc[0]
    z = 1.959963984540054
    n, p = float(r.n), r.n_keep / r.n
    center = (p + z * z / (2 * n)) / (1 + z * z / n)
    half = (z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
            ) / (1 + z * z / n)
    assert r.ci_low == pytest.approx(center - half, abs=1e-6)
    assert r.ci_high == pytest.approx(center + half, abs=1e-6)


def test_embedding_drift_bounds(spark):
    """Centroid cosine in [-1, 1]; the parity split of ONE zero-
    centered corpus has near-zero centroids, so the meaningful
    invariant is that the L2 shift is small in absolute terms (the
    cosine of two noise vectors is arbitrary — the metric fires on
    norm/shift, which is why both are reported); norms nonnegative;
    dim matches the table's vector width."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.queries import q_dq_embedding_drift

    row = q_dq_embedding_drift(spark, SF_DIR).collect()[0]
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert row.dim == len(emb.first().embedding)
    assert -1.0 - 1e-9 <= row.centroid_cos <= 1.0 + 1e-9
    assert row.centroid_l2_shift >= 0
    assert row.centroid_norm_v1 >= 0 and row.centroid_norm_v2 >= 0
    # same-corpus split: centroid shift is far below the typical
    # vector norm (a real v1->v2 re-embed would move it near norm
    # scale)
    mean_norm = emb.select(F.sqrt(F.aggregate(
        "embedding", F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double")))
        .alias("nrm")).agg(F.avg("nrm")).collect()[0][0]
    assert row.centroid_l2_shift < 0.2 * mean_norm


def test_image_quality_hist_partitions_decoded(spark):
    """Histogram rows partition the decoded corpus: bin counts sum to
    the decoded count, bins are within [0, 15], and keep_rate is a
    valid fraction per bin."""
    from data_quality_check_spark.operators.imgquality import (
        with_image_quality)
    from data_quality_check_spark.queries import (
        q_image_quality_hist, _images)

    pdf = q_image_quality_hist(spark, SF_DIR).toPandas()
    n_decoded = (with_image_quality(_images(spark, SF_DIR))
                 .filter("decoded").count())
    assert int(pdf.n.sum()) == n_decoded
    assert pdf.entropy_bin.between(0, 15).all()
    assert pdf.keep_rate.between(0, 1).all()
    assert pdf.n.gt(0).all()


def test_rule_ablation_counts_and_lift(spark):
    """Hand-checkable 2-rule ablation: n_keep_without - n_keep_all =
    rows blocked ONLY by that rule; lift = that / n_rows."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators import metrics

    rows = [("a", True, True), ("b", False, True), ("c", False, True),
            ("d", True, False), ("e", False, False)]
    df = spark.createDataFrame(rows, "id string, r1 boolean, r2 boolean")
    out = {r["rule"]: r for r in metrics.rule_ablation(
        df, {"one": F.col("r1"), "two": F.col("r2")}).collect()}
    assert out["one"]["n_rows"] == 5 and out["one"]["n_keep_all"] == 1
    assert out["one"]["n_hits"] == 3          # b, c, e fail r1
    assert out["one"]["n_keep_without"] == 3  # a, b, c pass r2
    assert out["one"]["keep_lift"] == 0.4     # (3-1)/5
    assert out["two"]["n_hits"] == 2 and out["two"]["n_keep_without"] == 2
    assert out["two"]["keep_lift"] == 0.2


def test_calibration_report_bins_and_gap(spark):
    """Hand-computed reliability diagram: a perfectly calibrated bin
    shows ~zero gap; an over-confident bin shows the exact gap."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators import metrics

    rows = ([(0.95, True)] * 9 + [(0.95, False)]        # bin 9: well calibrated (0.9)
            + [(0.85, False)] * 10)                      # bin 8: overconfident
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = {r["bin"]: r for r in metrics.calibration_report(
        df, "score", "y", bins=10).collect()}
    assert set(out) == {8, 9}
    assert out[9]["n"] == 10 and out[9]["frac_pos"] == 0.9
    assert out[9]["mean_pred"] == 0.95
    assert abs(out[9]["abs_gap"] - 0.05) < 1e-9
    assert out[8]["frac_pos"] == 0.0 and out[8]["abs_gap"] == 0.85
    # scores outside [0, 1) clamp into the edge bins
    edge = spark.createDataFrame([(1.0, True), (-0.2, False)],
                                 "score double, y boolean")
    bins = {r["bin"] for r in metrics.calibration_report(
        edge, "score", "y", bins=10).collect()}
    assert bins == {0, 9}
