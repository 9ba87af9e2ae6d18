"""Checkpoint/resume fault-injection tests (SURVEY.md §5.5; O-33):
crash after k waves, rerun, ledger-driven skip, identical final
output, idempotent rerun."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_quality_check_spark.plans import checkpoint as CP
from data_quality_check_spark.plans.catalog import LocalParquetCatalog
from data_quality_check_spark.sources import images as IM


@pytest.fixture()
def catroot():
    d = tempfile.mkdtemp(prefix="dqc-cat-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_crash_resume_and_idempotence(spark, catroot, oracle_labels):
    cat = LocalParquetCatalog(spark, catroot)
    df = IM.read_images(spark, 0.001)

    with pytest.raises(RuntimeError, match="injected"):
        CP.run(spark, cat, df, run_key="rk", wave_size=32, fail_after_wave=1)

    committed = CP.done_buckets(cat, "rk")
    assert 0 < len(committed) < 64

    stats = CP.run(spark, cat, df, run_key="rk", wave_size=32)
    assert stats["skipped"] == len(committed)

    res = cat.read_table(CP.RESULTS_TABLE)
    assert res.count() == 1000
    assert res.select("image_id").distinct().count() == 1000

    # verdicts identical to the oracle even across the crash boundary
    keep = {r["image_id"]: r["keep"] for r in
            res.select("image_id", "keep").collect()}
    truth = dict(zip(oracle_labels.image_id, oracle_labels.keep))
    assert keep == truth

    # full rerun with same key is a no-op
    stats2 = CP.run(spark, cat, df, run_key="rk")
    assert stats2["buckets"] == 0 and stats2["skipped"] == 64

    # audit covers every non-empty bucket with correct totals
    aud = cat.read_table(CP.AUDIT_TABLE)
    total = aud.agg(F.sum("n_rows")).collect()[0][0]
    assert total == 1000


def test_rerun_overwrite_is_byte_identical(spark, catroot):
    """O-28 exceptAll: rerunning a bucket (fresh run key) replaces its
    partition with identical content."""
    cat = LocalParquetCatalog(spark, catroot)
    df = IM.read_images(spark, 0.001)
    cols = ["image_id", "bucket", "keep", "lang", "ppl"]
    CP.run(spark, cat, df, run_key="a")
    first_pdf = (cat.read_table(CP.RESULTS_TABLE).select(*cols)
                 .toPandas().sort_values("image_id").reset_index(drop=True))

    CP.run(spark, cat, df, run_key="b")  # same input, new run key
    second = cat.read_table(CP.RESULTS_TABLE).select(*cols)
    assert second.count() == len(first_pdf)
    # exceptAll against the materialized first run is empty both ways
    a = spark.createDataFrame(first_pdf)
    assert a.exceptAll(second).count() == 0
    assert second.exceptAll(a).count() == 0
