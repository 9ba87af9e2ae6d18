"""Streaming ingest smoke (O-32): availableNow file stream over image
shards -> per-batch quality verdicts identical to the batch pipeline."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_quality_check_spark.sources import images as IM
from data_quality_check_spark.streaming.ingest import start_quality_stream


@pytest.fixture()
def shard_dir():
    d = tempfile.mkdtemp(prefix="dqc-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark, shard_dir, oracle_labels):
    pdf = IM.generate_pandas(0.001)
    # two shards
    for i, chunk in enumerate((pdf.iloc[:500], pdf.iloc[500:])):
        tbl = pa.Table.from_pandas(chunk, schema=IM.ARROW_SCHEMA,
                                   preserve_index=False)
        pq.write_table(tbl, os.path.join(shard_dir, f"in_shard{i}.parquet"))

    in_dir = shard_dir
    out_root = tempfile.mkdtemp(prefix="dqc-stream-out-")
    try:
        q = start_quality_stream(
            spark, in_dir, out_root,
            checkpoint_dir=os.path.join(out_root, "ckpt"),
            max_files_per_trigger=1)
        q.awaitTermination(120)

        res = spark.read.parquet(f"{out_root}/stream_results")
        assert res.count() == 1000
        got = {r["image_id"]: r["keep"] for r in
               res.select("image_id", "keep").collect()}
        want = dict(zip(oracle_labels.image_id, oracle_labels.keep))
        # dup-rank runs per micro-batch: a cross-shard duplicate whose
        # cluster members land in different batches may be kept in
        # both (streaming dedup needs state; documented limitation).
        mismatch = {k for k, v in got.items() if v != want[k]}
        for k in mismatch:
            assert got[k] and not want[k], "only keep-vs-dup drift allowed"
        assert len(mismatch) < 50
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def test_streaming_dq_reports_per_batch(spark, shard_dir):
    """Streaming DQ monitoring: one Suite report row-set per
    micro-batch, appended to the catalog like audit rows."""
    from data_quality_check_spark.api import Suite, checks as C
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog
    from data_quality_check_spark.streaming.dq import start_dq_stream

    pdf = IM.generate_pandas(0.001)
    for i, chunk in enumerate((pdf.iloc[:500], pdf.iloc[500:])):
        tbl = pa.Table.from_pandas(chunk, schema=IM.ARROW_SCHEMA,
                                   preserve_index=False)
        pq.write_table(tbl, os.path.join(shard_dir, f"s{i}.parquet"))

    out_root = tempfile.mkdtemp(prefix="dqc-dqstream-")
    try:
        cat = LocalParquetCatalog(spark, out_root)
        suite = Suite([
            C.not_null("image_id"),
            C.unique("image_id"),
            C.mean_between("w", 16, 4096),
        ])
        q = start_dq_stream(
            spark, shard_dir, IM.IMAGES_DDL, suite, cat,
            checkpoint_dir=os.path.join(out_root, "ckpt"),
            max_files_per_trigger=1).start()
        q.awaitTermination(120)

        rep = cat.read_table("dq_stream_reports").toPandas()
        # 2 micro-batches x 3 checks
        assert len(rep) == 6
        assert set(rep.batch_id) == {0, 1}
        assert set(rep.check) == {"not_null_image_id", "unique_image_id",
                                  "mean_w"}
        assert rep["pass"].all()
        by = rep.set_index(["batch_id", "check"])
        assert by.loc[(0, "mean_w"), "value"] > 16
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
