"""Declarative data-quality check API — the reference's namesake
capability ("We can use this project to test Data Quality for Big
Size data within seconds", /root/reference/README.md:2) as a
Spark-first surface.

A `Suite` is a list of declarative checks over any DataFrame; all
checks are compiled into ONE aggregation pass (single job, partial
aggregation / map-side combine, no per-check scans), so suite cost is
one table scan regardless of check count — that is what makes "big
size data within seconds" true at scale.

    from data_quality_check_spark.api import Suite, checks as C
    report = Suite([
        C.not_null("image_id"),
        C.unique("image_id"),
        C.in_range("w", 1, 10_000),
        C.matches("image_id", r"img_\\d{12}"),
        C.accepted_values("fmt", ["raw", "ppm", "png"]),
        C.expression("caption_ok", "length(caption) >= 12"),
    ]).run(images_df)
    report.passed        # bool
    report.to_rows()     # per-check dicts: name, kind, column,
                         # violations, total, pass

`unique` needs distinct counting and is folded into the same pass via
count(distinct col); Spark plans one multi-distinct aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str
    column: str | None
    violation_expr: Column | None = field(compare=False, default=None)
    distinct_col: str | None = None  # for `unique`


class checks:
    """Factory namespace for built-in check kinds."""

    @staticmethod
    def not_null(col: str) -> Check:
        return Check(f"not_null_{col}", "not_null", col,
                     F.col(col).isNull())

    @staticmethod
    def unique(col: str) -> Check:
        return Check(f"unique_{col}", "unique", col, None, distinct_col=col)

    @staticmethod
    def in_range(col: str, lo, hi) -> Check:
        return Check(f"in_range_{col}", "in_range", col,
                     ~F.col(col).between(lo, hi) | F.col(col).isNull())

    @staticmethod
    def matches(col: str, pattern: str) -> Check:
        return Check(f"matches_{col}", "matches", col,
                     ~F.col(col).rlike(pattern) | F.col(col).isNull())

    @staticmethod
    def accepted_values(col: str, values: list) -> Check:
        return Check(f"accepted_{col}", "accepted_values", col,
                     ~F.col(col).isin(values) | F.col(col).isNull())

    @staticmethod
    def expression(name: str, sql_predicate: str) -> Check:
        """Row passes iff the SQL predicate is true."""
        return Check(name, "expression", None,
                     ~F.expr(sql_predicate) | F.expr(sql_predicate).isNull())


@dataclass
class CheckResult:
    name: str
    kind: str
    column: str | None
    violations: int
    total: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


@dataclass
class Report:
    results: list[CheckResult]
    total_rows: int

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    def to_rows(self) -> list[dict]:
        return [{
            "check": r.name, "kind": r.kind, "column": r.column,
            "violations": r.violations, "total": r.total,
            "pass": r.passed,
        } for r in self.results]


class Suite:
    def __init__(self, check_list: list[Check]):
        self.checks = list(check_list)

    def aggregates(self) -> list[Column]:
        """The single-pass aggregate columns (exposed for the
        queries()/oracle contract)."""
        aggs = [F.count(F.lit(1)).alias("__total")]
        for c in self.checks:
            if c.distinct_col is not None:
                aggs.append(
                    (F.count(c.distinct_col) - F.countDistinct(c.distinct_col))
                    .alias(c.name))
            else:
                aggs.append(
                    F.sum(c.violation_expr.cast("long")).alias(c.name))
        return aggs

    def run(self, df: DataFrame) -> Report:
        row = df.agg(*self.aggregates()).collect()[0]
        total = row["__total"]
        return Report(
            results=[
                CheckResult(c.name, c.kind, c.column,
                            int(row[c.name] or 0), total)
                for c in self.checks
            ],
            total_rows=total,
        )

    def run_and_log(self, df: DataFrame, catalog, run_id: str,
                    table: str = "dq_reports") -> Report:
        """Run the suite and append the per-check report to a catalog
        table (the genre's rule-hit reporting, persisted like the
        pipeline's audit rows)."""
        import time

        report = self.run(df)
        now_us = int(time.time() * 1_000_000)
        catalog.append_rows(table, [
            {"run_id": run_id, **r, "logged_at": now_us}
            for r in report.to_rows()
        ])
        return report
