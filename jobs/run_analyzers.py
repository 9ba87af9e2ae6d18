"""spark-submit entry point: table-level DQ analyzers
(operators/dq.py) over parquet tables — the multi-table complements
to jobs/run_dq.py's single-pass row checks.

    # orphaned foreign keys
    spark-submit jobs/run_analyzers.py referential \
        --input s3://wh/orders --fk o_custkey \
        --parent s3://wh/customer --pk c_custkey

    # distribution drift between two populations of one table
    spark-submit jobs/run_analyzers.py drift \
        --input s3://wh/events --column value \
        --baseline-predicate "ts < timestamp'2024-06-01'" [--bins 10]

    # per-group Tukey-fence outliers
    spark-submit jobs/run_analyzers.py outliers \
        --input s3://wh/events --column value --group event_type

    # per-group ingestion lag vs the table watermark
    spark-submit jobs/run_analyzers.py freshness \
        --input s3://wh/events --ts-col ts --group event_type \
        --max-lag-seconds 3600

    # single-pass column profile (all columns, or --column a,b,c)
    spark-submit jobs/run_analyzers.py profile --input s3://wh/events

Prints the report as JSON lines; exit code 0 iff the analyzer's pass
condition holds (no orphans / total PSI <= threshold / no stale
group; outliers always exits 0 — it reports, it does not gate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, analyzer: str, input_path: str, *,
        column: str | None = None, group: str | None = None,
        fk: str | None = None, parent_path: str | None = None,
        pk: str | None = None, ts_col: str = "ts",
        baseline_predicate: str | None = None, bins: int = 10,
        k: float = 1.5, max_lag_seconds: float = 3600.0,
        psi_threshold: float = 0.2) -> tuple[list[dict], bool]:
    """Analyzer dispatch shared by the CLI and tests: returns
    (report rows, pass)."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.operators import dq

    df = spark.read.parquet(input_path)
    if analyzer == "referential":
        parent = spark.read.parquet(parent_path)
        rows = dq.referential_integrity(
            df, parent, fk, pk, f"{input_path}.{fk}->{parent_path}"
        ).collect()
        ok = all(r["ok"] for r in rows)
    elif analyzer == "drift":
        rows = dq.distribution_drift_psi(
            df, column, F.expr(baseline_predicate), bins=bins).collect()
        ok = sum(r["psi_term"] for r in rows) <= psi_threshold
    elif analyzer == "outliers":
        rows = dq.iqr_outliers(df, column, group, k=k).collect()
        ok = True  # reporting, not gating
    elif analyzer == "freshness":
        rows = dq.freshness(df, ts_col, group, max_lag_seconds).collect()
        ok = not any(r["stale"] for r in rows)
    elif analyzer == "profile":
        cols = (column.split(",") if column
                else [c for c, _t in df.dtypes])
        rows = dq.column_profile(df, cols).collect()
        ok = True  # reporting, not gating
    else:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return [r.asDict() for r in rows], ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("analyzer",
                    choices=["referential", "drift", "outliers",
                             "freshness", "profile"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--column")
    ap.add_argument("--group")
    ap.add_argument("--fk")
    ap.add_argument("--parent")
    ap.add_argument("--pk")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--baseline-predicate")
    ap.add_argument("--bins", type=int, default=10)
    ap.add_argument("--k", type=float, default=1.5)
    ap.add_argument("--max-lag-seconds", type=float, default=3600.0)
    ap.add_argument("--psi-threshold", type=float, default=0.2)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    from data_quality_check_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rows, ok = run(spark, args.analyzer, args.input,
                       column=args.column, group=args.group,
                       fk=args.fk, parent_path=args.parent, pk=args.pk,
                       ts_col=args.ts_col,
                       baseline_predicate=args.baseline_predicate,
                       bins=args.bins, k=args.k,
                       max_lag_seconds=args.max_lag_seconds,
                       psi_threshold=args.psi_threshold)
        for r in rows:
            print(json.dumps({kk: (vv if isinstance(
                vv, (int, float, bool, str, type(None))) else str(vv))
                for kk, vv in r.items()}))
        print(json.dumps({"analyzer": args.analyzer, "pass": ok}))
    finally:
        spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
