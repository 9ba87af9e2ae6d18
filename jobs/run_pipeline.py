"""spark-submit entry point (SURVEY.md §3 E1; BASELINE.json:14 "runs
via spark-submit --py-files on a multi-executor cluster").

Cluster usage:

    python tools/build_zip.py                       # -> dist/quality.zip
    spark-submit \
        --py-files dist/quality.zip \
        --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:1.5.0 \
        jobs/run_pipeline.py \
        --input  s3://bucket/images \
        --output s3://bucket/dq \
        --run-key nightly-2026-08-17 \
        --catalog iceberg

Sandbox usage (local parquet catalog):

    python jobs/run_pipeline.py --sf 0.01 --output /tmp/dq --run-key r1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="images table path (parquet dir)")
    ap.add_argument("--sf", type=float,
                    help="synthesize/use the deterministic images table at this SF")
    ap.add_argument("--output", required=True, help="catalog root")
    ap.add_argument("--run-key", required=True)
    ap.add_argument("--catalog", choices=["local", "iceberg"], default="local")
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--wave-size", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from data_quality_check_spark.constants import N_BUCKETS
    from data_quality_check_spark.plans import checkpoint as CP
    from data_quality_check_spark.plans.catalog import (
        IcebergCatalog,
        LocalParquetCatalog,
    )
    from data_quality_check_spark.session import get_spark
    from data_quality_check_spark.sources import images as IM

    spark = get_spark(master=args.master, app_name="dqc-pipeline")
    try:
        if args.input:
            df = spark.read.schema(IM.IMAGES_DDL).parquet(args.input)
        elif args.sf is not None:
            df = IM.read_images(spark, args.sf)
        else:
            ap.error("one of --input / --sf is required")
        cat = (IcebergCatalog(spark) if args.catalog == "iceberg"
               else LocalParquetCatalog(spark, args.output))
        stats = CP.run(spark, cat, df, run_key=args.run_key,
                       n_buckets=args.buckets or N_BUCKETS,
                       wave_size=args.wave_size)
        print(json.dumps(stats))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
