"""spark-submit entry point: the AUDIO quality gate over an audio
table — decode (from-scratch PCM-WAV), waveform statistics, rules
and keep verdict, plus exact-digest and fingerprint dedup reports.

Cluster usage:

    python tools/build_zip.py                       # -> dist/quality.zip
    spark-submit --py-files dist/quality.zip jobs/run_audio.py \
        --input s3://bucket/audio --output s3://bucket/audio_q \
        [--min-keep-rate 0.5] [--fingerprint-hamming 3]

Sandbox usage:

    python jobs/run_audio.py --sf 0.001 --output /tmp/audio_q

Writes one parquet row per clip (stats, per-rule booleans,
audio_keep) and prints the corpus report + dedup summary as JSON
lines.  Exit code 0 iff keep rate >= --min-keep-rate (default 0:
report-only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, input_path: str, output: str, *,
        fingerprint_hamming: int = 3) -> dict:
    """Job body shared by the CLI and tests: writes the per-clip
    verdict parquet, returns the summary dict."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators.audioquality import (
        audio_fingerprint_dups, quality_report, with_audio_quality)
    from data_quality_check_spark.operators.dedup import exact_dedup_binary

    au = spark.read.parquet(input_path)
    vq = with_audio_quality(au)
    vq.write.mode("overwrite").parquet(output)

    rep = quality_report(spark.read.parquet(output)).collect()[0].asDict()
    exact = exact_dedup_binary(au.select("clip_id", "bytes"),
                               id_col="clip_id")
    n_exact_groups = exact.count()
    n_fp_pairs = audio_fingerprint_dups(
        au, max_hamming=fingerprint_hamming).count()
    rep.update(n_exact_dup_groups=n_exact_groups,
               n_fingerprint_pairs=n_fp_pairs)
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

    spark = get_spark(app_name="dqc-audio")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        input_path = args.input
        if input_path is None:
            from data_quality_check_spark.sources.audio import ensure_audio
            input_path = ensure_audio(args.sf)
        rep = run(spark, input_path, args.output,
                  fingerprint_hamming=args.fingerprint_hamming)
        print(json.dumps(rep))
        return 0 if rep["keep_rate"] >= args.min_keep_rate else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
