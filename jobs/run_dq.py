"""spark-submit entry point: run a declarative DQ check suite
(api.Suite) over any parquet table from a JSON spec; one aggregation
pass regardless of check count.

Spec: a JSON list of {"kind": ..., "column"/..., args} objects, e.g.

    [{"kind": "not_null", "column": "image_id"},
     {"kind": "unique", "column": "image_id"},
     {"kind": "in_range", "column": "w", "lo": 1, "hi": 10000},
     {"kind": "matches", "column": "image_id", "pattern": "img_\\\\d{12}"},
     {"kind": "accepted_values", "column": "fmt", "values": ["raw", "png"]},
     {"kind": "expression", "name": "cap_ok", "predicate": "length(caption) >= 12"},
     {"kind": "completeness", "column": "caption", "min_ratio": 0.98},
     {"kind": "mean_between", "column": "w", "lo": 16, "hi": 4096},
     {"kind": "percentile_between", "column": "h", "q": 0.5, "lo": 16, "hi": 2048},
     {"kind": "distinct_count_between", "column": "phash", "lo": 2, "hi": 1000000000}]

    spark-submit --py-files dist/quality.zip jobs/run_dq.py \
        --input s3://bucket/images --checks checks.json \
        [--log-to s3://bucket/dq --run-id nightly-1]

Exit code 0 iff every check passes; the report prints as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_suite(spec: list[dict]):
    from data_quality_check_spark.api import Suite, checks as C

    builders = {
        "not_null": lambda s: C.not_null(s["column"]),
        "unique": lambda s: C.unique(s["column"]),
        "in_range": lambda s: C.in_range(s["column"], s["lo"], s["hi"]),
        "matches": lambda s: C.matches(s["column"], s["pattern"]),
        "accepted_values": lambda s: C.accepted_values(
            s["column"], s["values"]),
        "expression": lambda s: C.expression(s["name"], s["predicate"]),
        "completeness": lambda s: C.completeness(
            s["column"], s["min_ratio"]),
        "mean_between": lambda s: C.mean_between(
            s["column"], s["lo"], s["hi"]),
        "percentile_between": lambda s: C.percentile_between(
            s["column"], s["q"], s["lo"], s["hi"]),
        "distinct_count_between": lambda s: C.distinct_count_between(
            s["column"], s["lo"], s["hi"]),
    }
    cks = []
    for item in spec:
        kind = item.get("kind")
        if kind not in builders:
            raise SystemExit(f"unknown check kind: {kind!r} "
                             f"(supported: {sorted(builders)})")
        cks.append(builders[kind](item))
    return Suite(cks)


def run(spark, input_path: str, spec: list[dict],
        log_to: str | None = None, run_id: str | None = None) -> dict:
    df = spark.read.parquet(input_path)
    suite = build_suite(spec)
    if log_to:
        from data_quality_check_spark.plans.catalog import LocalParquetCatalog

        cat = LocalParquetCatalog(spark, log_to)
        report = suite.run_and_log(df, cat, run_id or "adhoc")
    else:
        report = suite.run(df)
    return {"input": input_path, "total_rows": report.total_rows,
            "passed": report.passed, "checks": report.to_rows()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--checks", required=True,
                    help="path to a JSON spec file, or an inline JSON list")
    ap.add_argument("--log-to", default=None,
                    help="catalog root to append the report to")
    ap.add_argument("--run-id", default=None)
    a = ap.parse_args()

    spec = (json.loads(a.checks) if a.checks.lstrip().startswith("[")
            else json.load(open(a.checks)))

    from data_quality_check_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, a.input, spec, a.log_to, a.run_id)
    print(json.dumps(out))
    sys.exit(0 if out["passed"] else 1)


if __name__ == "__main__":
    main()
