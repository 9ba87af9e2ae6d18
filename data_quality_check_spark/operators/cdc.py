"""Upsert / snapshot-diff primitives — the lakehouse change-data
side of the engine (Iceberg MERGE INTO / CDC read equivalents,
expressed as pure DataFrame plans so they run against any catalog).

Both are SINGLE full-outer-join plans: one shuffle per side on the
merge key, no payload replication, and the action classification is
a codegen CASE over per-side presence markers carried through the
join (a literal TRUE column per side — row absent on a side leaves
its marker NULL, so classification never keys on a nullable value
column).  At 10^12 rows the join is the standard SMJ on the key;
when one side is a small delta batch AQE broadcasts it (the common
MERGE case: big target, small source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str,
                 value_cols: list[str]) -> DataFrame:
    """SCD-1 MERGE: source rows override matching target rows
    (update), source-only rows insert, target-only rows are kept.
    Returns key + value_cols + `action` in ('insert','update','keep').

    The semantics match `MERGE INTO t USING s ON t.k = s.k WHEN
    MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` plus
    no-op retention of unmatched target rows (a full-snapshot
    rewrite).  Requires `key` unique on BOTH sides (assert upstream;
    a duplicate-key source makes MERGE ambiguous in every engine)."""
    t = target.select(key, *[F.col(c).alias(f"__t_{c}") for c in value_cols],
                      F.lit(True).alias("__in_t"))
    s = source.select(key, *[F.col(c).alias(f"__s_{c}") for c in value_cols],
                      F.lit(True).alias("__in_s"))
    j = t.join(s, key, "full_outer")
    action = (F.when(F.col("__in_t").isNull(), F.lit("insert"))
              .when(F.col("__in_s").isNull(), F.lit("keep"))
              .otherwise(F.lit("update")))
    out_vals = [F.when(F.col("__in_s").isNotNull(), F.col(f"__s_{c}"))
                .otherwise(F.col(f"__t_{c}")).alias(c) for c in value_cols]
    return j.select(F.col(key), *out_vals, action.alias("action"))


def table_diff(old: DataFrame, new: DataFrame, key: str,
               value_cols: list[str]) -> DataFrame:
    """Snapshot diff (CDC read between two table versions): one row
    per key whose state changed — `change` in ('added','removed',
    'changed'); unchanged keys are dropped.  Value comparison is
    null-safe (`<=>`), so a NULL->value transition counts as changed.

    Scale: the only wide operator is the full outer join on the key;
    comparison runs in the join's projection, and unchanged rows (the
    overwhelming majority between adjacent snapshots) are filtered
    before anything else sees them."""
    o = old.select(key, *[F.col(c).alias(f"__o_{c}") for c in value_cols],
                   F.lit(True).alias("__in_o"))
    n = new.select(key, *[F.col(c).alias(f"__n_{c}") for c in value_cols],
                   F.lit(True).alias("__in_n"))
    j = o.join(n, key, "full_outer")
    same_vals = F.lit(True)
    for c in value_cols:
        # eqNullSafe(str) would treat the string as a LITERAL — pass
        # the Column
        same_vals = same_vals & F.col(f"__o_{c}").eqNullSafe(
            F.col(f"__n_{c}"))
    change = (F.when(F.col("__in_o").isNull(), F.lit("added"))
              .when(F.col("__in_n").isNull(), F.lit("removed"))
              .when(~same_vals, F.lit("changed")))
    olds = [F.col(f"__o_{c}").alias(f"old_{c}") for c in value_cols]
    news = [F.col(f"__n_{c}").alias(f"new_{c}") for c in value_cols]
    return (j.select(F.col(key), *olds, *news, change.alias("change"))
            .filter(F.col("change").isNotNull()))


def scd2_history(changes: DataFrame, key: str, ts_col: str,
                 value_col: str, seq_col: str | None = None) -> DataFrame:
    """SCD-2 history build from a change log: collapse consecutive
    no-op updates, then turn each surviving change into a validity
    interval (valid_from, valid_to, is_current) — the slowly-changing-
    dimension table every warehouse derives from its CDC feed.

    A change row survives iff its value differs (null-safely) from
    the key's previous surviving value; valid_to is the NEXT
    surviving change's timestamp, open (NULL) on the latest.  Ties on
    ts break on seq_col (default: the value column — pass the change
    id for real feeds).

    Scale shape: both windows partition on the SAME key, so the plan
    is ONE shuffle — the lag/filter stage and the lead stage reuse
    the exchange (Catalyst collapses equal-partitioning windows into
    a single sort within one exchange).  No joins, no payload
    replication; skew = one hot entity's history on one task, which
    is the floor any per-entity ordering pays."""
    seq = seq_col or value_col
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(),
                                        F.col(seq).asc())
    changed = (changes
               .withColumn("__prev", F.lag(value_col).over(w))
               .withColumn("__first",
                           F.row_number().over(w) == 1)
               .filter(F.col("__first")
                       | ~F.col(value_col).eqNullSafe(F.col("__prev"))))
    w2 = Window.partitionBy(key).orderBy(F.col(ts_col).asc(),
                                         F.col(seq).asc())
    return (changed
            .withColumn("valid_to", F.lead(ts_col).over(w2))
            .select(F.col(key), F.col(value_col),
                    F.col(ts_col).alias("valid_from"),
                    "valid_to",
                    F.col("valid_to").isNull().alias("is_current")))
