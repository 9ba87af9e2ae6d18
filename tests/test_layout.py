"""Z-order layout semantics (operators/layout.py): interleave
correctness vs a python oracle, and the physical claim — after
zorder_layout, every output partition owns a disjoint key range."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_check_spark.operators import layout as L


def _morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_oracle(spark):
    vals = [(0, 0), (1, 0), (0, 1), (1, 1), (65535, 65535),
            (12345, 54321), (65536 + 7, 3)]  # last: x masked to 7
    df = spark.createDataFrame(vals, "x long, y long")
    got = {(r.x, r.y): r.z for r in df.select(
        "x", "y", L.zorder_key(F.col("x"), F.col("y")).alias("z")).collect()}
    for x, y in vals:
        assert got[(x, y)] == _morton(x & 0xFFFF, y & 0xFFFF)
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_zorder_locality_beats_linear_sort():
    """The reason to z-order: points close in BOTH dims land close in
    key space even when the linear (x-major) order scatters them."""
    near = abs(_morton(100, 100) - _morton(101, 101))
    far = abs(_morton(100, 100) - _morton(100, 50000))
    assert near < far  # y-distance dominates the interleaved key too


def test_zorder_layout_partitions_disjoint(spark):
    df = spark.range(5000).select(
        (F.col("id") * 7919 % 1024).alias("x"),
        (F.col("id") * 104729 % 1024).alias("y"))
    laid = L.zorder_layout(df, "x", "y", num_files=8)
    stats = (laid.groupBy(F.spark_partition_id().alias("pid"))
             .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
             .orderBy("lo").collect())
    assert len(stats) > 1
    for prev, cur in zip(stats, stats[1:]):
        assert prev["hi"] <= cur["lo"]  # contiguous, non-overlapping
    # rows sorted inside each partition (page-index pruning claim)
    rows = laid.select(F.spark_partition_id().alias("pid"),
                       "zkey").collect()
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.zkey)
    for ks in by_pid.values():
        assert ks == sorted(ks)


def test_zorder_sql_twin_agrees(spark):
    """The generated SQL interleave (the DuckDB oracle) is the same
    function — evaluated here through Spark's own SQL parser so the
    twins can't drift."""
    df = spark.createDataFrame([(3, 5), (1000, 2000)], "x long, y long")
    df.createOrReplaceTempView("zt")
    sql = L.zorder_key_sql("x", "y")
    got = spark.sql(f"SELECT x, y, {sql} AS z FROM zt").collect()
    for r in got:
        assert r.z == _morton(r.x, r.y)


def test_zorder_layout_prunes_2d_boxes(spark, tmp_path):
    """The reason the operator exists, measured on real parquet
    min-max statistics: against a 1-D range layout on x, the Z-order
    layout lets a y-predicate (which the x-layout cannot prune at
    all) and a 2-D box skip most row groups."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(40000).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"))
    p_x = str(tmp_path / "xsort")
    p_z = str(tmp_path / "zord")
    df.repartitionByRange(16, "x").sortWithinPartitions("x") \
        .write.parquet(p_x)
    L.zorder_layout(df, "x", "y", num_files=16).write.parquet(p_z)

    def touched(root, lo, hi, col):
        tot = hit = 0
        for f in glob.glob(root + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}[col]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                tot += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, tot

    # y-only predicate: the x layout cannot prune it at all
    yx_hit, yx_tot = touched(p_x, 90, 120, "y")
    yz_hit, yz_tot = touched(p_z, 90, 120, "y")
    assert yx_hit == yx_tot                 # x-layout reads everything
    assert yz_hit <= yz_tot // 2            # z-layout skips >= half
    # and the x dimension still prunes on the z layout too
    xz_hit, xz_tot = touched(p_z, 10, 40, "x")
    assert xz_hit < xz_tot
