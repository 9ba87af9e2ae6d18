"""Scaling-efficiency benchmark (BASELINE.json:2,14: throughput
scaling efficiency >= 0.8 from N to 4N executors).

No real cluster exists in the sandbox, so per the driver instruction
the same job runs at two parallelism levels -- local[N] and
local[4N] on the same input, with taskset confining each level to
exactly that many hardware cores; efficiency = (thr@4N / thr@N) / 4.
Each level: fresh SparkSession, 2 warm-ups, 3 timed runs, median.

Writes BENCH/scaling_{N}_{4N}.json; tools/write_baseline.py renders
BENCH/BASELINE.md from those artifacts.
Usage: python tools/bench_scaling.py [sf] [N=8]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = """
import json, shutil, sys, tempfile, time
sys.path.insert(0, {root!r})
from data_quality_check_spark.session import get_spark
from data_quality_check_spark.sources import images as IM
from data_quality_check_spark.plans import checkpoint as CP
from data_quality_check_spark.plans.catalog import LocalParquetCatalog

cores, sf = {cores}, {sf}
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=cores * 2,
                  app_name=f"dqc-scaling-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")

def one_run():
    d = tempfile.mkdtemp(prefix="dqc-scale-")
    try:
        df = IM.read_images(spark, sf)
        t0 = time.time()
        CP.run(spark, LocalParquetCatalog(spark, d), df,
               run_key=f"s{{time.time_ns()}}")
        return time.time() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)

one_run(); one_run()  # 2 warm-ups: worker pool fills over runs + JIT
runs = sorted(one_run() for _ in range(3))
print(json.dumps({{"cores": cores, "median_s": runs[1], "runs": runs}}))
spark.stop()
"""


def run_level(cores: int, sf: float) -> dict:
    code = WORKER.format(root=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), cores=cores, sf=sf)
    # taskset confines the WHOLE process tree (JVM + Python workers)
    # to `cores` hardware threads — otherwise local[8]'s Python
    # workers borrow all 32 host CPUs and the N-vs-4N comparison is
    # meaningless
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(f"scaling worker for local[{cores}] failed")
    return json.loads(lines[-1])


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from data_quality_check_spark.sources import images as IM
    IM.ensure_images(sf)
    n_rows = IM.sf_rows(sf)

    res = {}
    for cores in (n_small, n_small * 4):
        res[cores] = run_level(cores, sf)
        res[cores]["images_per_sec"] = round(n_rows / res[cores]["median_s"], 1)
        print(f"local[{cores}]: median {res[cores]['median_s']:.2f}s "
              f"({res[cores]['images_per_sec']} img/s)")

    big = n_small * 4
    speedup = res[big]["images_per_sec"] / res[n_small]["images_per_sec"]
    eff = speedup / 4
    summary = {
        "sf": sf, "rows": n_rows, "n": n_small, "4n": big,
        "thr_n": res[n_small]["images_per_sec"],
        "thr_4n": res[big]["images_per_sec"],
        "median_s_n": res[n_small]["median_s"],
        "median_s_4n": res[big]["median_s"],
        "speedup_n_to_4n": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
        "runs": {str(k): v["runs"] for k, v in res.items()},
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)

    with open(f"BENCH/scaling_{n_small}_{big}.json", "w") as f2:
        json.dump(summary, f2, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
