"""spark-submit entry point: end-to-end text near-dedup over any
parquet table (MinHash candidates -> exact Jaccard verify ->
connected components -> first-wins keepers).

    spark-submit --py-files dist/quality.zip jobs/run_dedup.py \
        --input s3://bucket/documents --text-col text --id-col doc_id \
        --threshold 0.5 --output s3://bucket/dedup/keepers

Sandbox: python jobs/run_dedup.py --input /root/testdata/sf0.01/documents.parquet \
    --output /tmp/keepers --threshold 0.5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, input_path: str, text_col: str, id_col: str,
        threshold: float, output: str | None) -> dict:
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators import dedup

    df = spark.read.parquet(input_path)
    keepers = dedup.text_near_dup_keepers(df, text_col, id_col,
                                          threshold=threshold)
    if output:
        keepers.write.mode("overwrite").parquet(output)
        keepers = spark.read.parquet(output)  # summarize what was written
    agg = keepers.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
        F.countDistinct("keeper_id").alias("n_clusters")).collect()[0]
    return {"n_docs": agg["n_docs"], "n_dups": int(agg["n_dups"] or 0),
            "n_clusters": agg["n_clusters"], "threshold": threshold,
            "output": output}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--output", default=None)
    a = ap.parse_args()

    from data_quality_check_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")
    print(json.dumps(run(spark, a.input, a.text_col, a.id_col,
                         a.threshold, a.output)))


if __name__ == "__main__":
    main()
