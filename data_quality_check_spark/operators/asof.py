"""As-of (point-in-time) join — the time-series primitive Spark's
DataFrame API lacks (pandas has `merge_asof`; DuckDB has `ASOF JOIN`,
which is exactly what the SQL oracle uses).

For every left row, attach the value columns of the LATEST right row
with `right.ts <= left.ts` (or strictly `<` with ``strict=True``)
within the same key.  The naive formulations both die at scale:

  - range self-join + row_number: replicates every left row by its
    whole right-side history before pruning to rank 1 — quadratic in
    events-per-key;
  - collect right side to the driver: not distributed at all.

This implementation is the single-shuffle union-window plan:

  1. tag left rows side=1, right rows side=0 (strict: side=2, so
     equal timestamps order AFTER the left row and are invisible
     to it), union them aligned on (key, ts) + null-padded columns;
  2. one window `PARTITION BY key ORDER BY ts, side, seq` with
     `last(struct(*values), ignorenulls=true) ROWS UNBOUNDED
     PRECEDING..CURRENT` carries the latest right ROW (all value
     columns together, NULL fields included) forward to every later
     left row;
  3. keep side=1 rows.

Exactly ONE shuffle (the window partitioning), shuffle volume =
|left| + |right| rows of (key, ts, values) — never a pair blow-up.
At 10^12 rows the plan survives: AQE range-splits a skewed key's sort,
and no row is ever replicated.  `seq` breaks ties between right rows
sharing (key, ts) deterministically (largest seq wins, matching the
"latest row" reading); pre-aggregate the right side to one row per
(key, ts) when an engine-independent tie rule is required — the
registered query key does exactly that so DuckDB's ASOF agrees
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_SEQ = "__asof_seq"
_CARRY = "__asof_carry"


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str], strict: bool = False,
              seq_col: str | None = None) -> DataFrame:
    """Left as-of join: left columns + `value_cols` from the latest
    right row at-or-before (before, if strict) each left row's `ts`
    per `key`.  Unmatched left rows keep nulls (LEFT semantics)."""
    right_side = 2 if strict else 0
    rseq = F.col(seq_col) if seq_col else F.lit(0)

    lpad = left.withColumn(_SIDE, F.lit(1)).withColumn(
        _SEQ, F.lit(0).cast("long"))
    for c in value_cols:
        lpad = lpad.withColumn(c, F.lit(None).cast(right.schema[c].dataType))

    rpad = (right.withColumn(_SIDE, F.lit(right_side))
            .withColumn(_SEQ, rseq.cast("long"))
            .select(key, ts, *value_cols, _SIDE, _SEQ))
    for f in left.schema.fields:
        if f.name not in (key, ts):
            rpad = rpad.withColumn(f.name, F.lit(None).cast(f.dataType))

    u = lpad.unionByName(rpad.select(*lpad.columns))
    # strict=True: right rows at an equal ts sort AFTER the left row
    # (side 2 > 1) and so are excluded from its backward window
    w = (Window.partitionBy(key).orderBy(ts, _SIDE, _SEQ)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # Carry ALL value columns as ONE struct: per-column
    # last(col, ignorenulls=True) would skip a right row whose value
    # is legitimately NULL (carrying an older row's value forward) and
    # could stitch the attached columns from DIFFERENT right rows.
    # pandas merge_asof / DuckDB ASOF JOIN attach the whole latest
    # row, NULL fields included — the struct is non-null for every
    # right row even when all its fields are null, so last(ignorenulls)
    # picks the latest matching ROW and we unpack its fields verbatim.
    carry = F.when(F.col(_SIDE) != 1, F.struct(*value_cols))
    u = u.withColumn(_CARRY, F.last(carry, ignorenulls=True).over(w))
    picked = u.filter(F.col(_SIDE) == 1)
    for c in value_cols:
        picked = picked.withColumn(c, F.col(_CARRY)[c])
    return picked.drop(_SIDE, _SEQ, _CARRY)
