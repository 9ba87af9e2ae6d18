"""Data-layout primitives for scan pruning at corpus scale.

A 100 TB table is read thousands of times per training run, so the
write-side layout is a first-class operator: parquet min-max row-group
statistics (and Iceberg file-level metrics) can only prune a scan if
rows that are close in the FILTERED dimensions are physically close in
the files.  A plain sort clusters one dimension and scatters the
other; a Z-order (Morton) key interleaves the bits of two dimensions
so that sorting by the single derived key clusters BOTH — the standard
layout trick for 2-D predicates (customer x date, lang x quality
bucket) used by Delta/Iceberg `OPTIMIZE ZORDER BY`.

Everything here is a pure per-row Column expression (zero shuffle to
COMPUTE the key; the one range-exchange to LAY OUT the data is the
point of the operation and replaces the write's existing exchange).
The bit math is plain integer arithmetic, reproducible exactly in any
engine — the contract key `layout_zorder` is value-checked against
DuckDB running the same interleave.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(col_x: Column, col_y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low `bits` bits of two non-negative
    int columns: result bit 2i is bit i of x, bit 2i+1 is bit i of y.
    2*bits <= 62 keeps the key inside a signed bigint with headroom.

    The interleave is monotone in each dimension within fixed ranges
    of the other, which is exactly the property min-max pruning needs:
    a predicate box [x0,x1] x [y0,y1] maps to O(few) contiguous key
    ranges, so files sorted by the key serve 2-D filters with a small
    superset of row groups."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    mask = (1 << bits) - 1
    x = col_x.cast("bigint").bitwiseAND(F.lit(mask))
    y = col_y.cast("bigint").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)),
                        2 * i))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)),
                        2 * i + 1))
    return z


def zorder_layout(df: DataFrame, col_x: str, col_y: str,
                  num_files: int = 64, bits: int = 16,
                  key_col: str = "zkey") -> DataFrame:
    """Lay a frame out for 2-D scan pruning: compute the Morton key,
    range-partition on it (each output file owns one contiguous,
    roughly equal-row key range — Spark samples the key distribution,
    so skewed dimensions still split evenly) and sort rows inside each
    file so parquet PAGE indexes prune below file level too.  Replaces
    — not adds to — the write's exchange: this IS the write layout."""
    keyed = df.withColumn(key_col, zorder_key(F.col(col_x), F.col(col_y),
                                              bits))
    return (keyed.repartitionByRange(num_files, key_col)
            .sortWithinPartitions(key_col))


def zorder_key_sql(col_x: str, col_y: str, bits: int = 16) -> str:
    """The identical interleave as portable SQL arithmetic (DuckDB
    oracle of the contract key) — generated, not hand-copied, so the
    two engines can't drift."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({col_x} & {mask}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({col_y} & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
