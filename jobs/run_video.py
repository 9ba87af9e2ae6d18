"""spark-submit entry point: the VIDEO quality gate over a video
table — RVID parse, stride frame sampling, statistics, rules and
keep verdict, plus fingerprint dedup pair counts.

Cluster usage:

    python tools/build_zip.py                       # -> dist/quality.zip
    spark-submit --py-files dist/quality.zip jobs/run_video.py \
        --input s3://bucket/video --output s3://bucket/video_q \
        [--min-keep-rate 0.5] [--fingerprint-hamming 3]

Sandbox usage:

    python jobs/run_video.py --sf 0.001 --output /tmp/video_q
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, input_path: str, output: str, *,
        fingerprint_hamming: int = 3) -> dict:
    """Job body shared by the CLI and tests."""
    from data_quality_check_spark.operators.videoquality import (
        quality_report, video_fingerprint_dups, with_video_quality)

    vi = spark.read.parquet(input_path)
    vq = with_video_quality(vi)
    vq.write.mode("overwrite").parquet(output)

    rep = quality_report(spark.read.parquet(output)).collect()[0].asDict()
    rep["n_fingerprint_pairs"] = video_fingerprint_dups(
        vi, max_hamming=fingerprint_hamming).count()
    return rep


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--sf", type=float)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-keep-rate", type=float, default=0.0)
    ap.add_argument("--fingerprint-hamming", type=int, default=3)
    args = ap.parse_args()
    if not args.input and args.sf is None:
        ap.error("one of --input / --sf is required")

    from data_quality_check_spark.session import get_spark

    spark = get_spark(app_name="dqc-video")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        input_path = args.input
        if input_path is None:
            from data_quality_check_spark.sources.video import ensure_video
            input_path = ensure_video(args.sf)
        rep = run(spark, input_path, args.output,
                  fingerprint_hamming=args.fingerprint_hamming)
        print(json.dumps(rep))
        return 0 if rep["keep_rate"] >= args.min_keep_rate else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
