"""spark-submit entry point: the VISUAL gate chain (pixel-quality
rules + watermark/NSFW/aesthetic risk gates) over an images table —
the decode-side complement to jobs/run_pipeline.py's caption/model
pipeline.

Cluster usage:

    python tools/build_zip.py                       # -> dist/quality.zip
    spark-submit --py-files dist/quality.zip jobs/run_visual.py \
        --input s3://bucket/images --output s3://bucket/visual \
        [--geometry-first] [--min-keep-rate 0.5]

Sandbox usage:

    python jobs/run_visual.py --sf 0.001 --output /tmp/visual

Writes one parquet row per image (stats, per-rule booleans,
visual_keep, risk_keep, keep_visual_all) and prints the two corpus
reports as JSON lines.  --geometry-first applies the metadata-only
res/aspect gates BEFORE the decode UDFs, so on a cluster the decode
stage pays only for rows that pass a ~16-byte/row scan — the SCALE.md
pre-filter pattern; rows dropped by geometry are still counted in the
summary.  Exit code 0 iff keep rate >= --min-keep-rate (default 0:
report-only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, input_path: str, output: str, *,
        geometry_first: bool = False) -> dict:
    """Job body shared by the CLI and tests: writes the per-image
    verdict parquet, returns the summary dict."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators.imgquality import (
        geometry_rules, quality_report, with_image_quality)
    from data_quality_check_spark.operators.imgscore import (
        risk_report, with_image_risk)

    im = spark.read.parquet(input_path)
    n_input = im.count()
    if geometry_first:
        geo = geometry_rules()
        im = im.filter(geo["res_ok"] & geo["aspect_ok"])

    vq = with_image_quality(im)
    rk = with_image_risk(im).select("image_id", "wm_strip_frac",
                                    "wm_corner_frac", "skin_frac",
                                    "aesthetic", "wm_strip_ok",
                                    "wm_corner_ok", "skin_ok",
                                    "aesthetic_ok", "risk_keep")
    out = (vq.join(rk, "image_id")
           .withColumn("keep_visual_all",
                       F.col("visual_keep") & F.col("risk_keep")))
    out.write.mode("overwrite").parquet(output)

    written = spark.read.parquet(output)
    q = quality_report(written).collect()[0].asDict()
    r = risk_report(written).collect()[0].asDict()
    n_keep = written.filter("keep_visual_all").count()
    return {
        "n_input": n_input,
        "n_scored": q["n_images"],
        "quality_report": q,
        "risk_report": r,
        "n_keep_visual_all": n_keep,
        "keep_rate": round(n_keep / n_input, 6) if n_input else 0.0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="images table path (parquet dir)")
    ap.add_argument("--sf", type=float,
                    help="synthesize/use the deterministic images table at this SF")
    ap.add_argument("--output", required=True)
    ap.add_argument("--geometry-first", action="store_true")
    ap.add_argument("--min-keep-rate", type=float, default=0.0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from data_quality_check_spark.session import get_spark
    from data_quality_check_spark.sources import images as IM

    spark = get_spark(master=args.master or "local[*]")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.input:
            path = args.input
        elif args.sf is not None:
            path = IM.ensure_images(args.sf)
        else:
            ap.error("one of --input / --sf is required")
        res = run(spark, path, args.output,
                  geometry_first=args.geometry_first)
        print(json.dumps(res, default=str))
        sys.exit(0 if res["keep_rate"] >= args.min_keep_rate else 1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
