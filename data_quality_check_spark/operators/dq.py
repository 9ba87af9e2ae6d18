"""Table-level data-quality ANALYZERS — the multi-table / multi-pass
complements to api.Suite's single-pass row checks (the reference's
namesake capability, /root/reference/README.md:2: "test Data Quality
for Big Size data within seconds").

Four production-grade checks a 100 TB lakehouse DQ job runs nightly:

  - referential_integrity: orphaned foreign keys across tables;
  - distribution_drift_psi: population-stability index between a
    baseline and a current population of the same column;
  - iqr_outliers: per-group Tukey-fence outlier counts on exact
    interpolated quartiles;
  - freshness: per-group ingestion lag against the table's watermark.

Scale notes per function docstring; every one is expressed in
whole-stage-codegen DataFrame ops (no UDFs) and shuffles only keys +
counters, so the cost model is one scan + one small-keyed exchange
each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_integrity(child: DataFrame, parent: DataFrame,
                          fk: str, pk: str,
                          child_name: str = "child") -> DataFrame:
    """Orphaned-FK report: one row (relation, total, orphans,
    null_fks, ok) for `child.fk -> parent.pk`.

    NULL fks are reported separately (SQL semantics: NULL never
    matches, but a nullable FK is usually legal) — `orphans` counts
    only non-null fks with no parent.

    Scale: the parent side projects to its pk ONLY and is distinct-ed
    before the join, so a 10^12-row child joins a |parent keys|-sized
    build side (broadcast when small, shuffle-hash otherwise — AQE
    picks); the child never shuffles its payload, only (fk) + the
    aggregation counters."""
    pkeys = parent.select(F.col(pk).alias("__pk")).distinct()
    j = (child.select(F.col(fk).alias("__fk"))
         .join(pkeys, F.col("__fk") == F.col("__pk"), "left"))
    return j.agg(
        F.lit(child_name).alias("relation"),
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col("__fk").isNotNull() & F.col("__pk").isNull())
              .cast("long")).alias("orphans"),
        F.sum(F.col("__fk").isNull().cast("long")).alias("null_fks"),
    ).withColumn("ok", F.col("orphans") == 0)


def distribution_drift_psi(df: DataFrame, col: str, side_col,
                           bins: int = 10, eps: float = 1e-6) -> DataFrame:
    """Population Stability Index between the two populations selected
    by boolean `side_col` (True = baseline, False = current) over
    equal-width bins of `col`'s GLOBAL [min, max].

    Returns one row per bin: (bin, n_base, n_curr, pct_base, pct_curr,
    psi_term) with psi_term = (pb - pc) * ln((pb+eps)/(pc+eps)) — the
    standard epsilon-smoothed form so empty bins contribute a finite
    term; sum(psi_term) is the PSI (> 0.2 conventionally = drift).

    Scale: two scans' worth of work fused into one — the global
    min/max is a broadcast one-row aggregate joined below the binning
    projection (no driver collect, stays one lazy plan), then ONE
    groupBy on (bin) with conditional counters; shuffle volume =
    `bins` rows."""
    mm = df.agg(F.min(col).alias("__mn"), F.max(col).alias("__mx"))
    binned = (df.select(F.col(col).alias("__v"),
                        F.when(side_col, True).otherwise(False)
                        .alias("__base"))
              .filter(F.col("__v").isNotNull())
              .crossJoin(F.broadcast(mm))
              .select(
                  F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
                  .otherwise(F.least(
                      F.lit(bins - 1),
                      F.floor((F.col("__v") - F.col("__mn"))
                              / (F.col("__mx") - F.col("__mn")) * bins)
                      .cast("int"))).alias("bin"),
                  "__base"))
    counts = binned.groupBy("bin").agg(
        F.sum(F.col("__base").cast("long")).alias("n_base"),
        F.sum((~F.col("__base")).cast("long")).alias("n_curr"))
    tot = counts.agg(F.sum("n_base").alias("__tb"),
                     F.sum("n_curr").alias("__tc"))
    pb = F.col("n_base") / F.col("__tb")
    pc = F.col("n_curr") / F.col("__tc")
    return (counts.crossJoin(F.broadcast(tot))
            .select("bin", "n_base", "n_curr",
                    F.round(pb, 6).alias("pct_base"),
                    F.round(pc, 6).alias("pct_curr"),
                    F.round((pb - pc) * F.log((pb + eps) / (pc + eps)), 6)
                    .alias("psi_term")))


def iqr_outliers(df: DataFrame, col: str, group_col: str,
                 k: float = 1.5) -> DataFrame:
    """Per-group Tukey-fence outlier report: exact interpolated Q1/Q3
    (Spark `percentile` == SQL quantile_cont), fences at
    [q1 - k*iqr, q3 + k*iqr], one row per group with the outlier
    count.

    Scale: ONE shuffle on the group key computing q1/q3 via the
    percentile aggregate, then a broadcast of the per-group fences
    back onto the scan for the count — expressed here as a self-join
    on the group key with the fence side aggregated first, which AQE
    broadcasts when |groups| is small (always, for sane group
    cardinalities).  Exact percentiles hold reducer state O(group
    rows) — swap percentile_approx in if a single group outgrows an
    executor (documented trade: approximate fences)."""
    q = df.groupBy(group_col).agg(
        F.percentile(col, 0.25).alias("__q1"),
        F.percentile(col, 0.75).alias("__q3"))
    fences = q.select(
        group_col,
        (F.col("__q1") - k * (F.col("__q3") - F.col("__q1"))).alias("__lo"),
        (F.col("__q3") + k * (F.col("__q3") - F.col("__q1"))).alias("__hi"))
    j = df.select(group_col, F.col(col).alias("__v")).join(
        F.broadcast(fences), group_col)
    return (j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(((F.col("__v") < F.col("__lo"))
               | (F.col("__v") > F.col("__hi"))).cast("long"))
        .alias("outliers"),
        F.round(F.first("__lo"), 6).alias("fence_lo"),
        F.round(F.first("__hi"), 6).alias("fence_hi")))


_NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "float",
                  "double", "decimal", "long")


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Deequ-style single-pass column profiler: one output row per
    profiled column with (column, total, n_null, null_frac,
    n_distinct, mean_numeric, min_numeric, max_numeric, avg_len) —
    the completeness / cardinality / basic-stats block a lakehouse DQ
    job records per table per day.  Numeric columns get
    mean/min/max; string columns get average length; each metric is
    NULL for the other family (no cross-engine try_cast games on
    arbitrary text).

    Scale: every metric for every column folds into ONE aggregation
    over ONE scan — countDistinct per column makes that a single
    expand-style multi-aggregate (Spark plans one Expand + one
    exchange of counter rows; there is no per-column pass).  The
    per-column rows are then unpivoted from the single result row
    with an explode that costs nothing.  At 10^12 rows swap
    countDistinct for approx_count_distinct per column to keep the
    distinct state sketch-sized (documented trade)."""
    if not cols:
        raise ValueError("column_profile needs at least one column")
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        t = dtypes[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        if any(t.startswith(p) for p in _NUMERIC_TYPES):
            v = F.col(c).cast("double")
            aggs.append(F.avg(v).alias(f"__mean_{c}"))
            aggs.append(F.min(v).alias(f"__min_{c}"))
            aggs.append(F.max(v).alias(f"__max_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__len_{c}"))
        else:
            nul = F.lit(None).cast("double")
            aggs.append(nul.alias(f"__mean_{c}"))
            aggs.append(nul.alias(f"__min_{c}"))
            aggs.append(nul.alias(f"__max_{c}"))
            if t in ("string", "binary"):
                aggs.append(F.avg(F.length(F.col(c)).cast("double"))
                            .alias(f"__len_{c}"))
            else:  # arrays/maps/structs/timestamps: no length metric
                aggs.append(nul.alias(f"__len_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.round(F.col(f"__mean_{c}"), 6).alias("mean_numeric"),
            F.round(F.col(f"__min_{c}"), 6).alias("min_numeric"),
            F.round(F.col(f"__max_{c}"), 6).alias("max_numeric"),
            F.round(F.col(f"__len_{c}"), 6).alias("avg_len"),
        ) for c in cols])
    out = row.select(F.col("__total").alias("total"),
                     F.explode(per_col).alias("p"))
    return out.select(
        F.col("p.column").alias("column"), "total",
        F.col("p.n_null").alias("n_null"),
        F.round(F.col("p.n_null") / F.col("total"), 6).alias("null_frac"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.mean_numeric").alias("mean_numeric"),
        F.col("p.min_numeric").alias("min_numeric"),
        F.col("p.max_numeric").alias("max_numeric"),
        F.col("p.avg_len").alias("avg_len"))


def freshness(df: DataFrame, ts_col: str, group_col: str,
              max_lag_seconds: float) -> DataFrame:
    """Per-group ingestion-lag report against the table watermark
    (the global max timestamp): one row per group with its latest
    timestamp, lag in seconds, and the stale flag.

    Scale: one groupBy(max) shuffle of (group, ts) pairs + a
    broadcast one-row global max; no payload columns ever enter the
    plan."""
    grp = df.groupBy(group_col).agg(F.max(ts_col).alias("latest"))
    wm = df.agg(F.max(ts_col).alias("__wm"))
    # exact integer microsecond difference, then ONE division: works
    # for TIMESTAMP and TIMESTAMP_NTZ alike (neither casts to a
    # numeric directly), is timezone-free, and both engines compute
    # the identical double from the identical int64 — computing
    # epoch(a) - epoch(b) instead would round twice at the edge of
    # double's microsecond representability (~1e9 s * 1e-6)
    lag_us = F.expr("timestampdiff(MICROSECOND, latest, __wm)")
    lag = lag_us.cast("double") / F.lit(1000000.0)
    return (grp.crossJoin(F.broadcast(wm))
            .select(group_col, "latest",
                    lag.alias("lag_seconds"),
                    (lag > max_lag_seconds).alias("stale")))


def profile_drift(old: DataFrame, new: DataFrame, cols: list[str],
                  null_jump: float = 0.05,
                  mean_rel: float = 0.1) -> DataFrame:
    """Snapshot-over-snapshot profile drift (the check a lakehouse DQ
    job runs between yesterday's and today's table versions): diff
    the single-pass column_profile of both snapshots per column —
    null-fraction jump, distinct-count delta, numeric-mean shift,
    string-length shift — and flag columns whose null fraction jumped
    more than `null_jump` or whose mean moved more than `mean_rel`
    relative.  Catches the classic silent regressions (an upstream
    parser starts emitting NULLs; a unit change shifts a numeric
    column) that row-level rules cannot see.

    Scale: two single-pass profile aggregations (one per snapshot)
    joined on the tiny per-column key — cost = the two scans."""
    po = column_profile(old, cols).select(
        "column", F.col("total").alias("total_old"),
        F.col("null_frac").alias("__nf_o"),
        F.col("n_distinct").alias("__nd_o"),
        F.col("mean_numeric").alias("__mn_o"),
        F.col("avg_len").alias("__al_o"))
    pn = column_profile(new, cols).select(
        "column", F.col("total").alias("total_new"),
        F.col("null_frac").alias("__nf_n"),
        F.col("n_distinct").alias("__nd_n"),
        F.col("mean_numeric").alias("__mn_n"),
        F.col("avg_len").alias("__al_n"))
    nf_d = F.col("__nf_n") - F.col("__nf_o")
    mean_d = F.col("__mn_n") - F.col("__mn_o")
    drifted = (F.abs(nf_d) > null_jump) | (
        F.col("__mn_o").isNotNull()
        & (F.abs(mean_d) > mean_rel
           * F.greatest(F.abs(F.col("__mn_o")), F.lit(1e-9))))
    return (po.join(pn, "column")
            .select("column", "total_old", "total_new",
                    F.round(nf_d, 6).alias("null_frac_delta"),
                    (F.col("__nd_n") - F.col("__nd_o"))
                    .alias("distinct_delta"),
                    F.round(mean_d, 6).alias("mean_delta"),
                    F.round(F.col("__al_n") - F.col("__al_o"), 6)
                    .alias("avg_len_delta"),
                    drifted.alias("drifted")))


def split_contamination(train: DataFrame, eval_df: DataFrame,
                        threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-level train/eval contamination audit: for every EVAL
    row, how many TRAIN rows sit within cosine >= `threshold`, plus
    the max cosine and the worst offender — the semantic companion of
    the n-gram decontamination family (a paraphrased or re-encoded
    copy of an eval item shares no 13-gram but cos ~0.97+).

    Scale shape (10^12 train rows): the EVAL side is small by nature
    (benchmarks are 10^3-10^6 rows), so it BROADCASTS and the train
    table streams through map-side — one scan, no shuffle of train
    vectors, and the per-eval aggregate is a groupBy on the eval id
    only.  Exact by construction (every train row is scored), which
    is what an audit wants — LSH recall misses are exactly the
    contaminated pairs you care about; cost is one fused
    multiply-add pass per (train, eval) pair, the same budget as one
    epoch of a linear probe."""
    from .similarity import _dot, _dvec, _norm

    t = train.select(F.col(id_col).alias("train_id"),
                     _dvec(F.col(vec_col)).alias("tv"))
    t = t.select("train_id", "tv", _norm(F.col("tv")).alias("__tn"))
    e = eval_df.select(F.col(id_col).alias("eval_id"),
                       _dvec(F.col(vec_col)).alias("ev"))
    e = e.select("eval_id", "ev", _norm(F.col("ev")).alias("__en"))
    scored = (t.crossJoin(F.broadcast(e))
              .withColumn("cos", F.round(
                  _dot(F.col("tv"), F.col("ev"))
                  / (F.col("__tn") * F.col("__en")), 6)))
    hits = scored.filter(F.col("cos") >= threshold)
    agg = hits.groupBy("eval_id").agg(
        F.count("*").alias("n_contaminating"),
        F.max("cos").alias("max_cos"),
        F.min(F.struct((-F.col("cos")).alias("__nc"),
                       F.col("train_id"))).alias("__w"))
    base = e.select("eval_id")
    # both sides of the closing left join are eval-sized (small by
    # contract) — broadcast the agg so the report never shuffles
    return (base.join(F.broadcast(agg), "eval_id", "left")
            .select("eval_id",
                    F.coalesce("n_contaminating", F.lit(0))
                    .cast("long").alias("n_contaminating"),
                    F.col("max_cos"),
                    F.col("__w.train_id").alias("worst_train_id"),
                    (F.coalesce("n_contaminating", F.lit(0)) > 0)
                    .alias("is_contaminated")))
