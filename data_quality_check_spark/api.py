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
        C.completeness("caption", 0.98),
        C.mean_between("w", 16, 4096),
        C.percentile_between("h", 0.5, 16, 2048),
        C.distinct_count_between("phash", 2, 10**12),
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
    # value-based checks (Deequ-style): one aggregate VALUE compared
    # against [lo, hi] instead of a violation count
    agg_expr: Column | None = field(compare=False, default=None)
    lo: float | None = None
    hi: float | None = None
    # ratio-threshold checks: pass iff violations/total <= max_ratio
    max_ratio: float | None = None


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

    @staticmethod
    def completeness(col: str, min_ratio: float) -> Check:
        """Pass iff the non-null fraction of `col` >= min_ratio."""
        return Check(f"completeness_{col}", "completeness", col,
                     F.col(col).isNull(), max_ratio=1.0 - min_ratio)

    @staticmethod
    def mean_between(col: str, lo: float, hi: float) -> Check:
        return Check(f"mean_{col}", "mean_between", col,
                     agg_expr=F.avg(col), lo=lo, hi=hi)

    @staticmethod
    def percentile_between(col: str, q: float, lo: float,
                           hi: float) -> Check:
        """Exact interpolated percentile (Spark `percentile`, the
        same linear-interpolation definition as SQL quantile_cont);
        use in_range/expression checks for approximate needs."""
        return Check(f"p{int(round(q * 100))}_{col}", "percentile_between",
                     col, agg_expr=F.percentile(col, q), lo=lo, hi=hi)

    @staticmethod
    def distinct_count_between(col: str, lo: int, hi: int) -> Check:
        return Check(f"distinct_{col}", "distinct_count_between", col,
                     agg_expr=F.countDistinct(col).cast("double"),
                     lo=float(lo), hi=float(hi))


@dataclass
class CheckResult:
    name: str
    kind: str
    column: str | None
    violations: int
    total: int
    value: float | None = None       # value-based checks
    lo: float | None = None
    hi: float | None = None
    max_ratio: float | None = None   # ratio-threshold checks

    @property
    def passed(self) -> bool:
        if self.lo is not None or self.hi is not None:
            return (self.value is not None
                    and (self.lo is None or self.value >= self.lo)
                    and (self.hi is None or self.value <= self.hi))
        if self.max_ratio is not None:
            if self.total == 0:
                return True
            return self.violations / self.total <= self.max_ratio
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
            "value": r.value, "pass": r.passed,
        } for r in self.results]


class Suite:
    def __init__(self, check_list: list[Check]):
        self.checks = list(check_list)

    def aggregates(self) -> list[Column]:
        """The single-pass aggregate columns (exposed for the
        queries()/oracle contract)."""
        aggs = [F.count(F.lit(1)).alias("__total")]
        for c in self.checks:
            if c.agg_expr is not None:
                aggs.append(c.agg_expr.alias(c.name))
            elif c.distinct_col is not None:
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
        results = []
        for c in self.checks:
            if c.agg_expr is not None:
                v = row[c.name]
                results.append(CheckResult(
                    c.name, c.kind, c.column, 0, total,
                    value=None if v is None else float(v),
                    lo=c.lo, hi=c.hi))
            else:
                results.append(CheckResult(
                    c.name, c.kind, c.column, int(row[c.name] or 0),
                    total, max_ratio=c.max_ratio))
        return Report(results=results, total_rows=total)

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
