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


def test_streaming_visual_quality_reports(spark, shard_dir):
    """Per-micro-batch pixel-quality reports equal the batch
    operator's partials exactly (shared operator, not a re-impl):
    counts are additive across batches and each batch row matches
    quality_report run on that shard alone."""
    from data_quality_check_spark.operators.imgquality import (
        quality_report, with_image_quality)
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog
    from data_quality_check_spark.streaming.dq import (
        start_visual_quality_stream)

    pdf = IM.generate_pandas(0.001)
    # unequal shard sizes so the batch twin below can be matched to
    # its micro-batch by n_images (file->batch order isn't guaranteed)
    chunks = (pdf.iloc[:400], pdf.iloc[400:])
    for i, chunk in enumerate(chunks):
        tbl = pa.Table.from_pandas(chunk, schema=IM.ARROW_SCHEMA,
                                   preserve_index=False)
        pq.write_table(tbl, os.path.join(shard_dir, f"s{i}.parquet"))

    out_root = tempfile.mkdtemp(prefix="dqc-vqstream-")
    try:
        cat = LocalParquetCatalog(spark, out_root)
        q = start_visual_quality_stream(
            spark, shard_dir, IM.IMAGES_DDL, cat,
            checkpoint_dir=os.path.join(out_root, "ckpt"),
            max_files_per_trigger=1).start()
        q.awaitTermination(120)

        rep = cat.read_table("visual_quality_reports").toPandas()
        assert len(rep) == 2 and set(rep.batch_id) == {0, 1}
        assert int(rep.n_images.sum()) == 1000

        # batch twin per shard: identical values column for column
        # (micro-batch file order is not guaranteed -> match by size)
        want = {}
        for chunk in chunks:
            sdf = spark.createDataFrame(chunk)
            row = quality_report(with_image_quality(sdf)).collect()[0]
            want[row["n_images"]] = row.asDict()
        for _, got in rep.iterrows():
            exp = want[int(got["n_images"])]
            for k, v in exp.items():
                assert got[k] == pytest.approx(v), k
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def test_stream_static_enrichment(spark, shard_dir):
    """Stream-static broadcast join: every micro-batch row is
    enriched from the dimension; unmatched keys keep LEFT nulls."""
    import pandas as pd

    from data_quality_check_spark.streaming.joins import stream_static_enrich

    pq.write_table(pa.table({"k": [0, 1, 2, 0, 3], "v": list(range(5))}),
                   os.path.join(shard_dir, "s0.parquet"))
    stream = (spark.readStream.schema("k long, v long")
              .parquet(shard_dir))
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [0, 1, 2], "name": ["a", "b", "c"]}))
    out_dir = tempfile.mkdtemp(prefix="dqc-sse-")
    try:
        q = (stream_static_enrich(stream, dim, "k")
             .writeStream.format("parquet")
             .option("path", f"{out_dir}/out")
             .option("checkpointLocation", f"{out_dir}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = {(r.k, r.v): r.name
                for r in spark.read.parquet(f"{out_dir}/out").collect()}
        assert rows == {(0, 0): "a", (1, 1): "b", (2, 2): "c",
                        (0, 3): "a", (3, 4): None}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_stream_stream_interval_join(spark, shard_dir):
    """Watermarked stream-stream join: purchases match clicks of the
    same user within the lookback interval only."""
    import datetime as dt

    import pandas as pd

    from data_quality_check_spark.streaming.joins import (
        stream_stream_interval_join)

    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    ldir = os.path.join(shard_dir, "l"); os.makedirs(ldir)
    rdir = os.path.join(shard_dir, "r"); os.makedirs(rdir)
    # write micro-second timestamps explicitly: pandas' default ns
    # unit lands as a parquet INT64 Spark won't read as timestamp
    pq.write_table(pa.table(
        {"user": pa.array([1, 1, 2], pa.int64()),
         "ts": pa.array([m(20), m(40), m(20)], pa.timestamp("us")),
         "pid": pa.array([100, 101, 102], pa.int64())}),
        f"{ldir}/0.parquet")
    pq.write_table(pa.table(
        {"user": pa.array([1, 1, 2], pa.int64()),
         "ts": pa.array([m(15), m(25), m(0)], pa.timestamp("us")),
         "cid": pa.array([7, 8, 9], pa.int64())}),
        f"{rdir}/0.parquet")

    left = spark.readStream.schema("user long, ts timestamp, pid long") \
        .parquet(ldir)
    right = spark.readStream.schema("user long, ts timestamp, cid long") \
        .parquet(rdir)
    out_dir = tempfile.mkdtemp(prefix="dqc-ssj-")
    try:
        q = (stream_stream_interval_join(left, right, "user", "ts",
                                         interval="10 minutes")
             .selectExpr("pid", "cid_r AS cid")
             .writeStream.format("parquet")
             .option("path", f"{out_dir}/out")
             .option("checkpointLocation", f"{out_dir}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r.pid, r.cid)
               for r in spark.read.parquet(f"{out_dir}/out").collect()}
        # pid 100 (12:20): clicks at 12:15 ok, 12:25 is in the future
        # pid 101 (12:40): 12:25 is 15 min back -> outside interval
        # pid 102 (12:20): user-2 click at 12:00 -> outside interval
        assert got == {(100, 7)}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_stream_restart_resumes_exactly_once(spark, shard_dir):
    """Checkpointed restart: a second availableNow run with the SAME
    checkpoint processes only shards that arrived after the first run
    — no reprocessing, no duplicate verdicts — and a REPLAYED batch
    is idempotent because each micro-batch overwrites its own
    batch_id partition instead of blind-appending."""
    pdf = IM.generate_pandas(0.001)
    chunks = (pdf.iloc[:500], pdf.iloc[500:])
    out_root = tempfile.mkdtemp(prefix="dqc-stream-restart-")
    ckpt = os.path.join(out_root, "ckpt")
    try:
        for i, chunk in enumerate(chunks):
            tbl = pa.Table.from_pandas(chunk, schema=IM.ARROW_SCHEMA,
                                       preserve_index=False)
            pq.write_table(tbl, os.path.join(shard_dir,
                                             f"shard{i}.parquet"))
            q = start_quality_stream(spark, shard_dir, out_root,
                                     checkpoint_dir=ckpt,
                                     max_files_per_trigger=1)
            q.awaitTermination(120)
            res = spark.read.parquet(f"{out_root}/stream_results")
            n = res.count()
            assert n == 500 * (i + 1), f"run {i}: {n} rows"
            assert res.select("image_id").distinct().count() == n
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def test_streaming_drift_monitor(spark, shard_dir):
    """Per-micro-batch PSI vs a frozen baseline: an identically
    distributed shard reports ~0 PSI, a shifted shard crosses the 0.2
    drift threshold; bin edges come from the BASELINE only."""
    import numpy as np
    import pandas as pd

    from data_quality_check_spark.plans.catalog import LocalParquetCatalog
    from data_quality_check_spark.streaming.dq import start_drift_stream

    rng = np.random.default_rng(7)
    base_vals = rng.normal(50.0, 5.0, 4000)
    base_pdf = pd.DataFrame({"event_id": np.arange(4000),
                             "value": base_vals})
    # shard 0: same distribution (fresh draws); shard 1: shifted +30
    same = pd.DataFrame({"event_id": np.arange(4000, 6000),
                         "value": rng.normal(50.0, 5.0, 2000)})
    shifted = pd.DataFrame({"event_id": np.arange(6000, 8000),
                            "value": rng.normal(80.0, 5.0, 2000)})
    pq.write_table(pa.Table.from_pandas(same, preserve_index=False),
                   os.path.join(shard_dir, "in_shard0.parquet"))
    pq.write_table(pa.Table.from_pandas(shifted, preserve_index=False),
                   os.path.join(shard_dir, "in_shard1.parquet"))

    baseline = spark.createDataFrame(base_pdf)
    out_root = tempfile.mkdtemp(prefix="dqc-drift-out-")
    try:
        cat = LocalParquetCatalog(spark, out_root)
        q = start_drift_stream(
            spark, shard_dir, "event_id long, value double",
            baseline, "value", cat,
            checkpoint_dir=os.path.join(out_root, "ckpt"),
            max_files_per_trigger=1).start()
        q.awaitTermination(120)
        rows = {r["batch_id"]: r for r in
                cat.read_table("drift_reports").collect()}
        psis = sorted(r["psi"] for r in rows.values())
        assert len(rows) == 2
        assert psis[0] < 0.05          # same-distribution batch
        assert psis[1] > 0.2           # shifted batch flagged
        flagged = [r for r in rows.values() if r["drift"]]
        assert len(flagged) == 1 and flagged[0]["psi"] == psis[1]
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def test_streaming_visual_risk_reports(spark, shard_dir):
    """Per-micro-batch risk reports equal the batch operator's
    partials exactly (shared operator, not a re-impl) — the risk twin
    of the visual-quality stream test."""
    from data_quality_check_spark.operators.imgscore import (
        risk_report, with_image_risk)
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog
    from data_quality_check_spark.streaming.dq import (
        start_visual_risk_stream)

    pdf = IM.generate_pandas(0.001)
    chunks = (pdf.iloc[:400], pdf.iloc[400:])
    for i, chunk in enumerate(chunks):
        tbl = pa.Table.from_pandas(chunk, schema=IM.ARROW_SCHEMA,
                                   preserve_index=False)
        pq.write_table(tbl, os.path.join(shard_dir, f"s{i}.parquet"))

    out_root = tempfile.mkdtemp(prefix="dqc-vrstream-")
    try:
        cat = LocalParquetCatalog(spark, out_root)
        q = start_visual_risk_stream(
            spark, shard_dir, IM.IMAGES_DDL, cat,
            checkpoint_dir=os.path.join(out_root, "ckpt"),
            max_files_per_trigger=1).start()
        q.awaitTermination(120)

        rep = cat.read_table("visual_risk_reports").toPandas()
        assert len(rep) == 2 and set(rep.batch_id) == {0, 1}
        assert int(rep.n_images.sum()) == 1000

        want = {}
        for chunk in chunks:
            sdf = spark.createDataFrame(chunk)
            row = risk_report(with_image_risk(sdf)).collect()[0]
            want[row["n_images"]] = row.asDict()
        for _, got in rep.iterrows():
            exp = want[int(got["n_images"])]
            for k, v in exp.items():
                assert got[k] == pytest.approx(v), k
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def test_streaming_decontamination_matches_batch(spark, shard_dir):
    """Union of per-micro-batch decontamination verdicts == one batch
    visual_decontaminate run over the union (shared operator; the
    stream adds only the batch_id tag)."""
    from data_quality_check_spark.operators.dedup import (
        visual_decontaminate)
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog
    from data_quality_check_spark.streaming.dq import (
        start_decontamination_stream)

    pdf = IM.generate_pandas(0.001)
    sfx = pdf["image_id"].str[4:].astype(int)
    ev_pdf = pdf[(sfx % 10 == 0).to_numpy()]
    tr_pdf = pdf[(sfx % 10 != 0).to_numpy()]
    ev = spark.createDataFrame(
        ev_pdf[["image_id", "phash"]], "image_id string, phash long")

    chunks = (tr_pdf.iloc[:450], tr_pdf.iloc[450:])
    for i, chunk in enumerate(chunks):
        tbl = pa.Table.from_pandas(chunk, schema=IM.ARROW_SCHEMA,
                                   preserve_index=False)
        pq.write_table(tbl, os.path.join(shard_dir, f"d{i}.parquet"))

    out_root = tempfile.mkdtemp(prefix="dqc-decon-stream-")
    try:
        cat = LocalParquetCatalog(spark, out_root)
        q = start_decontamination_stream(
            spark, shard_dir, IM.IMAGES_DDL, ev, cat,
            checkpoint_dir=os.path.join(out_root, "ckpt"),
            max_files_per_trigger=1).start()
        q.awaitTermination(120)

        got = cat.read_table("decontamination_verdicts").toPandas()
        assert len(got) == len(tr_pdf)
        assert set(got.batch_id) == {0, 1}

        tr = spark.createDataFrame(
            tr_pdf[["image_id", "phash"]], "image_id string, phash long")
        want = visual_decontaminate(tr, ev).toPandas()
        cols = ["id", "contaminated", "eval_match", "min_hamming"]
        a = got[cols].sort_values("id").reset_index(drop=True)
        b = want[cols].sort_values("id").reset_index(drop=True)
        assert a.equals(b)
        assert bool(a.contaminated.any())  # fixture has real hits
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def test_streaming_decontamination_dihedral_gate(spark, shard_dir):
    """dihedral=True: a streamed shard containing a MIRRORED eval
    copy is flagged; stream verdicts == the batch dihedral operator
    over the union."""
    from data_quality_check_spark.operators.dedup import (
        dihedral_phash_py, visual_decontaminate_dihedral)
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog
    from data_quality_check_spark.streaming.dq import (
        start_decontamination_stream)

    pdf = IM.generate_pandas(0.001)
    sfx = pdf["image_id"].str[4:].astype(int)
    ev_pdf = pdf[(sfx % 10 == 0).to_numpy()]
    tr_pdf = pdf[(sfx % 10 != 0).to_numpy()].copy()
    # plant a mirrored copy of an eval image in the second shard
    src = int(ev_pdf["phash"].iloc[3])
    tr_pdf.iloc[-1, tr_pdf.columns.get_loc("phash")] = \
        dihedral_phash_py(src, 4)
    planted = tr_pdf["image_id"].iloc[-1]
    ev = spark.createDataFrame(
        ev_pdf[["image_id", "phash"]], "image_id string, phash long")

    chunks = (tr_pdf.iloc[:450], tr_pdf.iloc[450:])
    for i, chunk in enumerate(chunks):
        tbl = pa.Table.from_pandas(chunk, schema=IM.ARROW_SCHEMA,
                                   preserve_index=False)
        pq.write_table(tbl, os.path.join(shard_dir, f"d{i}.parquet"))

    out_root = tempfile.mkdtemp(prefix="dqc-decon-flip-")
    try:
        cat = LocalParquetCatalog(spark, out_root)
        q = start_decontamination_stream(
            spark, shard_dir, IM.IMAGES_DDL, ev, cat,
            checkpoint_dir=os.path.join(out_root, "ckpt"),
            max_hamming=2, max_files_per_trigger=1,
            dihedral=True).start()
        q.awaitTermination(120)

        got = cat.read_table("decontamination_verdicts").toPandas()
        assert len(got) == len(tr_pdf)
        hit = got[got.id == planted].iloc[0]
        assert bool(hit.contaminated) and hit.min_hamming == 0

        tr = spark.createDataFrame(
            tr_pdf[["image_id", "phash"]], "image_id string, phash long")
        want = visual_decontaminate_dihedral(tr, ev, 2).toPandas()
        cols = ["id", "contaminated", "eval_match", "min_hamming"]
        a = got[cols].sort_values("id").reset_index(drop=True)
        b = want[cols].sort_values("id").reset_index(drop=True)
        assert a.equals(b)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def test_streaming_semantic_contamination_reaggregates(spark, shard_dir):
    """Per-micro-batch semantic contamination verdicts RE-AGGREGATE to
    the batch audit over the union: sum of per-batch counts and max of
    per-batch max_cos per eval row equal one split_contamination run
    (shared operator; streaming adds only the batch_id tag)."""
    from data_quality_check_spark.operators.dq import split_contamination
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog
    from data_quality_check_spark.streaming.dq import (
        start_semantic_contamination_stream)

    em = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").toPandas()
    ev_pdf = em[em.vec_id % 10 == 0]
    tr_pdf = em[em.vec_id % 10 != 0]
    ev = spark.createDataFrame(ev_pdf)

    for i, chunk in enumerate((tr_pdf.iloc[:225], tr_pdf.iloc[225:])):
        chunk.to_parquet(os.path.join(shard_dir, f"e{i}.parquet"),
                         index=False)

    ddl = "vec_id bigint, embedding array<float>, label int"
    out_root = tempfile.mkdtemp(prefix="dqc-semcon-stream-")
    try:
        cat = LocalParquetCatalog(spark, out_root)
        q = start_semantic_contamination_stream(
            spark, shard_dir, ddl, ev, cat,
            checkpoint_dir=os.path.join(out_root, "ckpt"),
            threshold=0.38, max_files_per_trigger=1).start()
        q.awaitTermination(120)

        got = cat.read_table("semantic_contamination").toPandas()
        assert set(got.batch_id) == {0, 1}
        agg = (got.groupby("eval_id")
               .agg(n=("n_contaminating", "sum"),
                    mc=("max_cos", "max")).reset_index())

        want = split_contamination(
            spark.createDataFrame(tr_pdf), ev, 0.38).toPandas()
        merged = want.merge(agg, on="eval_id")
        assert len(merged) == len(want) == len(ev_pdf)
        assert (merged.n_contaminating == merged.n).all()
        hit = merged[merged.n_contaminating > 0]
        assert len(hit) > 0  # fixture has real hits at 0.38
        assert (hit.max_cos == hit.mc).all()
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
