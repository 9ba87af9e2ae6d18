"""CLI job surfaces (jobs/run_dedup.py, jobs/run_dq.py): the run()
bodies driven with the shared session (spark-submit wiring is arg
parsing + get_spark only)."""

from __future__ import annotations

import json

import pytest


def test_run_dedup_job(spark, tmp_path):
    from jobs import run_dedup

    out = str(tmp_path / "keepers")
    res = run_dedup.run(spark, "/root/testdata/sf0.001/documents.parquet",
                        "text", "doc_id", 0.5, out)
    assert res["n_docs"] == 500
    assert 0 < res["n_dups"] < 500
    assert res["n_clusters"] == 500 - res["n_dups"]
    written = spark.read.parquet(out)
    assert written.count() == 500
    assert set(written.columns) == {"id", "keeper_id", "is_dup"}


def test_run_dq_job_pass_and_fail(spark, tmp_path):
    from jobs import run_dq

    spec = [
        {"kind": "not_null", "column": "image_id"},
        {"kind": "unique", "column": "image_id"},
        {"kind": "accepted_values", "column": "fmt",
         "values": ["raw", "ppm", "png", "rawq"]},
        {"kind": "completeness", "column": "caption", "min_ratio": 0.9},
        {"kind": "mean_between", "column": "w", "lo": 16, "hi": 4096},
        {"kind": "percentile_between", "column": "h", "q": 0.5,
         "lo": 16, "hi": 2048},
        {"kind": "distinct_count_between", "column": "phash",
         "lo": 2, "hi": 10**12},
    ]
    res = run_dq.run(spark, "/root/repo/data/images_sf0.001.parquet", spec)
    assert res["passed"], res["checks"]
    assert res["total_rows"] == 1000

    bad = run_dq.run(spark, "/root/repo/data/images_sf0.001.parquet",
                     [{"kind": "completeness", "column": "caption",
                       "min_ratio": 1.0}])
    assert not bad["passed"]  # fixture plants null captions

    # report logging goes through the catalog like pipeline audit rows
    logged = run_dq.run(spark, "/root/repo/data/images_sf0.001.parquet",
                        spec, log_to=str(tmp_path / "cat"), run_id="t1")
    assert logged["passed"]
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog

    cat = LocalParquetCatalog(spark, str(tmp_path / "cat"))
    assert cat.read_table("dq_reports").count() == len(spec)

    # spec is JSON round-trippable (the CLI contract)
    assert json.loads(json.dumps(spec)) == spec


def test_run_dq_unknown_kind(spark):
    from jobs import run_dq

    with pytest.raises(SystemExit):
        run_dq.build_suite([{"kind": "nope"}])


def test_run_analyzers_job(spark):
    from jobs import run_analyzers

    rows, ok = run_analyzers.run(
        spark, "referential", "/root/testdata/sf0.001/orders.parquet",
        fk="o_custkey",
        parent_path="/root/testdata/sf0.001/customer.parquet",
        pk="c_custkey")
    assert ok and rows[0]["orphans"] == 0

    rows, ok = run_analyzers.run(
        spark, "drift", "/root/testdata/sf0.001/events.parquet",
        column="value", baseline_predicate="event_id % 2 = 0")
    assert ok  # same-table halves: no drift
    assert abs(sum(r["psi_term"] for r in rows)) < 0.2

    rows, ok = run_analyzers.run(
        spark, "outliers", "/root/testdata/sf0.001/events.parquet",
        column="value", group="event_type")
    assert ok and all(r["total"] > 0 for r in rows)

    rows, ok = run_analyzers.run(
        spark, "freshness", "/root/testdata/sf0.001/events.parquet",
        group="event_type", max_lag_seconds=1.0)
    assert not ok  # 1s threshold: some event type is always stale

    rows, ok = run_analyzers.run(
        spark, "profile", "/root/testdata/sf0.001/events.parquet")
    assert ok and {r["column"] for r in rows} == {
        "event_id", "ts", "user_id", "event_type", "value", "props"}
    assert all(r["total"] == rows[0]["total"] for r in rows)

    with pytest.raises(ValueError, match="unknown analyzer"):
        run_analyzers.run(spark, "nope", "/root/testdata/sf0.001/events.parquet")


def test_run_visual_job(spark, tmp_path):
    from jobs import run_visual

    out = str(tmp_path / "visual")
    res = run_visual.run(
        spark, "/root/repo/data/images_sf0.001.parquet", out)
    assert res["n_input"] == 1000
    assert res["n_scored"] == 1000
    assert 0 < res["n_keep_visual_all"] < 1000
    assert res["quality_report"]["n_decoded"] > 900
    assert res["risk_report"]["n_images"] == 1000
    written = spark.read.parquet(out)
    assert written.count() == 1000
    assert "keep_visual_all" in written.columns
    # verdict composition holds row-wise
    bad = written.filter(
        "keep_visual_all != (visual_keep AND risk_keep)").count()
    assert bad == 0

    # geometry-first: decode skips rows failing the metadata gates,
    # but the summary still accounts for every input row
    res2 = run_visual.run(
        spark, "/root/repo/data/images_sf0.001.parquet",
        str(tmp_path / "visual2"), geometry_first=True)
    assert res2["n_input"] == 1000
    assert res2["n_scored"] < 1000          # geometry tail dropped
    assert res2["n_keep_visual_all"] == res["n_keep_visual_all"]


def test_run_audio_job(spark, tmp_path):
    from data_quality_check_spark.sources.audio import ensure_audio
    from jobs import run_audio

    out = str(tmp_path / "audio_q")
    res = run_audio.run(spark, ensure_audio(0.001), out)
    assert res["n_clips"] == 200
    assert res["n_decoded"] > 190
    assert 0 < res["n_keep"] < 200
    assert res["n_exact_dup_groups"] > 0      # planted re-uploads
    assert res["n_fingerprint_pairs"] > 0     # incl. gain variants
    written = spark.read.parquet(out)
    assert written.count() == 200
    assert "audio_keep" in written.columns


def test_run_video_job(spark, tmp_path):
    from data_quality_check_spark.sources.video import ensure_video
    from jobs import run_video

    out = str(tmp_path / "video_q")
    res = run_video.run(spark, ensure_video(0.01), out)
    assert res["n_videos"] == 200
    assert res["n_decoded"] > 190
    assert 0 < res["n_keep"] < 200
    assert res["n_fingerprint_pairs"] > 0
    written = spark.read.parquet(out)
    assert written.count() == 200
    assert "video_keep" in written.columns
