"""Cross-batch stateful dedup (applyInPandasWithState): a phash seen
in shard 1 must be flagged duplicate when it reappears in shard 2."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_quality_check_spark.sources import images as IM
from data_quality_check_spark.streaming.ingest import read_image_stream
from data_quality_check_spark.streaming.stateful import streaming_dedup


@pytest.fixture()
def dirs():
    ind = tempfile.mkdtemp(prefix="dqc-ss-in-")
    outd = tempfile.mkdtemp(prefix="dqc-ss-out-")
    yield ind, outd
    shutil.rmtree(ind, ignore_errors=True)
    shutil.rmtree(outd, ignore_errors=True)


def test_cross_batch_dedup(spark, dirs):
    ind, outd = dirs
    pdf = IM.generate_pandas(0.001)
    # split so duplicate clusters straddle the two shards
    for i, chunk in enumerate((pdf.iloc[:500], pdf.iloc[500:])):
        tbl = pa.Table.from_pandas(chunk, schema=IM.ARROW_SCHEMA,
                                   preserve_index=False)
        pq.write_table(tbl, os.path.join(ind, f"shard{i}.parquet"))

    stream = read_image_stream(spark, ind, max_files_per_trigger=1)
    q = (
        streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", os.path.join(outd, "res"))
        .option("checkpointLocation", os.path.join(outd, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    res = spark.read.parquet(os.path.join(outd, "res")).toPandas()
    assert len(res) == 1000
    # exactly one non-dup (the keeper) per distinct phash, across batches
    keepers = res[~res.is_dup].groupby("phash").size()
    assert (keepers == 1).all()
    assert res[~res.is_dup].phash.nunique() == pdf.phash.nunique()
    # duplicates flagged even when the first sighting was an earlier shard
    multi = pdf.groupby("phash").size()
    dup_phashes = set(multi[multi > 1].index)
    flagged = set(res[res.is_dup].phash)
    assert flagged == dup_phashes
