"""Headline benchmark (driver contract: one JSON line to stdout).

Runs the full quality-filter pipeline (scan -> rules -> 4 Arrow UDFs
-> dup-rank -> keep -> results/audit/ledger writes) over the
synthetic images table at the SF implied by $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1 => SF=0.1 => 100k images), plus a set
of headline relational queries over the driver fixtures, on
local[$SPARK_GRAFT_CPUS].

Prints: {"metric": "...", "value": N, "unit": "sec",
         "queries": {...}, "sf": ...}
`value` = wall seconds of the full pipeline run (scan->write).
Scaling evidence (local[8] vs local[32]) is produced separately by
tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_KEYS = [
    "agg_pricing_summary",
    "join_smj_3way",
    "win_moving",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "text_quality_score",
    "multimodal_features",
    "dedup_text_pipeline",
    "dedup_phash_hamming_distinct",
    "dedup_crossmodal",
    "join_asof",
    "dedup_image_pipeline",
    "dq_drift_psi",
    "text_dup_spans",
    "text_bloom_decontaminate",
    "dedup_semantic",
    "classifier_distill",
    "image_quality_stats",
    "image_risk_stats",
    "join_fuzzy",
    "dedup_containment",
    "text_bm25_topk",
    "dedup_visual_decontaminate",
    "dedup_visual_flips",
    "sample_dsir",
    "text_bigram_nll",
]


def run_pipeline(spark, sf: float, out_root: str) -> float:
    from data_quality_check_spark.plans import checkpoint as CP
    from data_quality_check_spark.plans.catalog import LocalParquetCatalog
    from data_quality_check_spark.sources import images as IM

    cat = LocalParquetCatalog(spark, out_root)
    df = IM.read_images(spark, sf)
    t0 = time.time()
    CP.run(spark, cat, df, run_key=f"bench-{time.time_ns()}")
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from data_quality_check_spark.queries import REGISTRY, _sf_of
    from data_quality_check_spark.session import get_spark
    from data_quality_check_spark.sources import images as IM

    sf = _sf_of(sf_dir)
    IM.ensure_images(sf)  # generation cost excluded from timings

    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus) * 2, 16),
                      app_name="dqc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    tmp_dirs: list[str] = []

    def _tmp() -> str:
        d = tempfile.mkdtemp(prefix="dqc-bench-")
        tmp_dirs.append(d)
        return d

    try:
        # warm-ups at the TARGET sf: the Python-worker pool fills over
        # the first runs (+ JIT/codegen) — BASELINE.md bench protocol
        run_pipeline(spark, sf, _tmp())
        run_pipeline(spark, sf, _tmp())
        runs = sorted(run_pipeline(spark, sf, _tmp()) for _ in range(5))
        # noise floor (min), not median: the shared host takes
        # 1.5-2x CPU-steal bursts that land on individual runs (an
        # interleaved A/B of identical code measured 4.4-31s for the
        # same job) — same estimator as the BENCH/BASELINE.md scaling
        # protocol; 5 timed runs because the Python-worker pool keeps
        # warming through run ~4 on this host
        timings["pipeline"] = round(runs[0], 3)

        def _force(df) -> int:
            # evaluate EVERY output column: .count() lets Catalyst
            # prune expensive projections and even eliminate left
            # joins against unique-keyed aggregates (CLAUDE.md),
            # which made row-preserving keys (text_dup_spans,
            # dedup_semantic) time near-zero while computing nothing.
            # Registry outputs are scalar-only by contract, so a
            # whole-row hash aggregate is always valid.
            from pyspark.sql import functions as F
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h"),
            ).collect()[0]
            return row["n"]

        for key in HEADLINE_KEYS:
            fn, _sql = REGISTRY[key]
            _force(fn(spark, sf_dir))  # warm: codegen/JIT compile
            # min of 3: the host has noisy-neighbor CPU steal and a
            # single timed run regularly reads 1.5-2x high
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                n = _force(fn(spark, sf_dir))
                best = min(best, time.time() - t0)
                assert n >= 0
            timings[key] = round(best, 3)
    finally:
        for d in tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()

    n_rows = IM.sf_rows(sf)
    print(json.dumps({
        "metric": "full_pipeline_wall",
        "value": timings["pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": 3,
        "estimator": "min of 3 timed runs after 1 warm run",
        "rows": n_rows,
        "images_per_sec": round(n_rows / timings["pipeline"], 1),
    }))


if __name__ == "__main__":
    main()
