"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row count, column names, and order-insensitive values
(exact for non-floats, exact-after-round for floats — stricter than a
value-hash).  Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif s.dtype == object:
            pdf[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"rowcount {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # signbit agreement makes this gate as strict as the
            # driver's bit-sensitive value hash: -0.0 == +0.0 under
            # == but the two hash differently (round-3 driver red on
            # image_quality_stats was exactly this).
            # NOTE: must be & (both NaN), not == — `isnan(a)==isnan(b)`
            # is also True when BOTH are plain numbers, which made the
            # old form pass any non-NaN float mismatch vacuously.
            ok = ((np.isnan(av) & np.isnan(bv))
                  | ((av == bv) & (np.signbit(av) == np.signbit(bv))))
            if not ok.all():
                bad = np.nonzero(~ok)[0][:3]
                return f"col {c} float mismatch at {bad}: {av[bad]} vs {bv[bad]}"
        else:
            if not a[c].equals(b[c]):
                neq = (a[c] != b[c])
                idx = neq[neq].index[:3].tolist()
                return (f"col {c} mismatch at {idx}: "
                        f"{a[c].iloc[idx].tolist()} vs {b[c].iloc[idx].tolist()}")
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from data_quality_check_spark.queries import REGISTRY
    from data_quality_check_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    # the multimodal oracles SELECT from the numpy-oracle fixture
    # parquet at the driver's compare scale — generate-once cache
    from data_quality_check_spark.operators.multimodal import (
        expected_fixtures, expected_near_dup_pairs)
    from data_quality_check_spark.oracle_fixtures import (
        ensure_hash_fixtures, ensure_label_fixtures)
    from data_quality_check_spark.operators.imgquality import (
        expected_imgquality)
    from data_quality_check_spark.operators.imgscore import (
        expected_imgrisk)
    from data_quality_check_spark.operators.audioquality import (
        expected_audiofp, expected_audioquality)
    from data_quality_check_spark.operators.videoquality import (
        expected_videofp, expected_videoquality)
    expected_fixtures(0.01)
    expected_near_dup_pairs(0.01)
    ensure_label_fixtures(0.01)
    ensure_hash_fixtures(0.01)
    expected_imgquality(0.01)
    expected_imgrisk(0.01)
    expected_audioquality(0.01)
    expected_audiofp(0.01)
    expected_videoquality(0.01)
    expected_videofp(0.01)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_rowsonly = 0
    for key, (fn, sql) in REGISTRY.items():
        if only and key not in only:
            continue
        t0 = time.time()
        # oracles that read the generated images parquet by path are
        # pinned to sf0.01 (the driver's compare scale) — run the
        # Spark side at the same scale
        eff_dir = ("/root/testdata/sf0.01"
                   if sql and "_sf0.01" in sql else sf_dir)
        try:
            sdf = fn(spark, eff_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {key}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"rows  {key}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            if len(sdf) == 0 and key != "dedup_ngram_jaccard":
                print(f"  WARNING: 0 rows for rows-only {key}")
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL  {key}: duckdb error {e}")
            n_fail += 1
            continue
        err = compare(sdf, ddf)
        if err:
            print(f"FAIL  {key}: {err}")
            n_fail += 1
        else:
            print(f"ok    {key}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
