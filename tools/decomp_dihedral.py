"""Stage decomposition for dihedral_pairs_big (VERDICT r4 item 2):
time each pipeline stage of dihedral_near_dups separately at one
taskset-confined core count, materializing stage boundaries with
localCheckpoint so each measurement covers exactly one stage family.

Stages (collapse_exact path):
  collapse   groupBy(phash) -> reps                     (1 shuffle)
  varr       8-variant array build (64-term exprs)      (map)
  va         posexplode + groupBy(id, vph) variant dedup(1 shuffle)
  band_ab    two-level band table over va (9 rows/hash) (map)
  band_bb    two-level band table over varr             (map)
  joinagg    band join + in-stream verify + min-code agg(1 shuffle+join)
  expand     rep->member hash equi-joins + union        (joins)

Usage: taskset -c 0-7 python tools/decomp_dihedral.py 8 [runs=2]
Prints one JSON line per run with per-stage seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_quality_check_spark.session import get_spark  # noqa: E402


def force(df):
    df.agg(F.bit_xor(F.xxhash64(F.struct(*df.columns)))).collect()


def main() -> None:
    cores = int(sys.argv[1])
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf = 0.1
    spark = get_spark(master=f"local[{cores}]",
                      shuffle_partitions=cores * 2,
                      app_name=f"dqc-decomp-{cores}")
    spark.sparkContext.setLogLevel("ERROR")

    from data_quality_check_spark.operators import dedup
    from data_quality_check_spark.operators.dedup import (
        _dihedral_directed_codes, _widen, dihedral_phash_sql,
        phash_band_table)
    from data_quality_check_spark.sources import images as IM

    R = 8
    im0 = IM.read_images(spark, sf).select("image_id", "phash")
    im = (im0.crossJoin(spark.range(R).select(F.col("id").alias("__rep")))
          .select(F.concat("image_id", F.lit("-"),
                           F.col("__rep").cast("string")).alias("image_id"),
                  F.col("phash")
                  .bitwiseXOR(F.when(F.col("__rep") == 0,
                                     F.lit(0).cast("long"))
                              .otherwise(F.xxhash64("__rep")))
                  .alias("phash"))
          .localCheckpoint())
    max_hamming = 2

    def one_decomp() -> dict:
        t: dict[str, float] = {}
        t0 = time.time()
        base = (_widen(im).filter(F.col("phash").isNotNull())
                .select(F.col("image_id").alias("__id"),
                        F.col("phash").alias("__ph")))
        reps = (base.groupBy("__ph").agg(F.min("__id").alias("__id"))
                .select("__id", "__ph").localCheckpoint())
        t["collapse"] = time.time() - t0

        t0 = time.time()
        exprs = dihedral_phash_sql("__ph")
        varr = (reps.select("__id", "__ph",
                            F.array(*[F.expr(e) for e in exprs])
                            .alias("__va"))
                .localCheckpoint())
        t["varr"] = time.time() - t0

        t0 = time.time()
        inv_arr = F.array(*[F.lit(x) for x in dedup._DIHEDRAL_INV])
        va = (varr.select("__id",
                          F.posexplode("__va").alias("__t", "__vph"))
              .groupBy("__id", "__vph")
              .agg(F.min("__t").alias("__t"),
                   F.min(F.element_at(inv_arr, F.col("__t") + 1))
                   .alias("__ti"))
              .select(F.struct("__id", "__t", "__ti").alias("__idt"),
                      "__vph").localCheckpoint())
        t["va"] = time.time() - t0

        t0 = time.time()
        ab = phash_band_table(va, max_hamming, "__idt", "__vph",
                              two_level=True).localCheckpoint()
        t["band_ab"] = time.time() - t0
        t0 = time.time()
        bb = phash_band_table(varr, max_hamming, "__id", "__ph",
                              two_level=True).localCheckpoint()
        t["band_bb"] = time.time() - t0

        t0 = time.time()
        d = F.bit_count(F.col("a.__ph").bitwiseXOR(F.col("b.__ph")))
        codes = (ab.alias("a")
                 .join(bb.hint("shuffle_hash").alias("b"),
                       (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bv") == F.col("b.bv")))
                 .filter(F.col("a.__id.__id") < F.col("b.__id"))
                 .select(F.col("a.__id.__id").alias("id_a"),
                         F.col("b.__id").alias("id_b"),
                         (d * 8 + F.col("a.__id.__t")).alias("__cab"),
                         (d * 8 + F.col("a.__id.__ti")).alias("__cba"),
                         d.alias("__d"))
                 .filter(F.col("__d") <= max_hamming)
                 .groupBy("id_a", "id_b")
                 .agg(F.min("__cab").alias("__code_ab"),
                      F.min("__cba").alias("__code_ba"))
                 .localCheckpoint())
        t["joinagg"] = time.time() - t0

        t0 = time.time()
        rp = (codes
              .join(reps.select(F.col("__id").alias("id_a"),
                                F.col("__ph").alias("__pa")), "id_a")
              .join(reps.select(F.col("__id").alias("id_b"),
                                F.col("__ph").alias("__pb")), "id_b"))
        cross = (rp
                 .join(base.select(F.col("__ph").alias("__pa"),
                                   F.col("__id").alias("__ia")), "__pa")
                 .join(base.select(F.col("__ph").alias("__pb"),
                                   F.col("__id").alias("__ib")), "__pb")
                 .select(F.least("__ia", "__ib").alias("id_a"),
                         F.greatest("__ia", "__ib").alias("id_b"),
                         F.when(F.col("__ia") < F.col("__ib"),
                                F.col("__code_ab"))
                         .otherwise(F.col("__code_ba"))
                         .alias("__code")))
        within = (base.alias("a").join(
            base.alias("b"),
            (F.col("a.__ph") == F.col("b.__ph"))
            & (F.col("a.__id") < F.col("b.__id")))
            .select(F.col("a.__id").alias("id_a"),
                    F.col("b.__id").alias("id_b"),
                    F.lit(0).cast("int").alias("__code")))
        out = (cross.select("id_a", "id_b",
                            F.col("__code").cast("int").alias("__code"))
               .unionByName(within)
               .select("id_a", "id_b",
                       F.floor(F.col("__code") / 8).cast("int")
                       .alias("min_hamming"),
                       (F.col("__code") % 8).cast("int")
                       .alias("orientation")))
        force(out)
        t["expand"] = time.time() - t0
        t["total"] = sum(t.values())
        return {k: round(v, 2) for k, v in t.items()}

    one_decomp()  # warm-up
    for _ in range(runs):
        print(json.dumps({"cores": cores, **one_decomp()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
