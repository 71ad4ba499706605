"""Host-ceiling probe: how much parallel speedup can THIS machine show
at all, independent of our engine?

Runs a trivial whole-stage-codegen job (md5 + groupBy over spark.range —
no Python, no source I/O, no skew, no driver logic) at two parallelism
levels in both topologies. Any scaling-efficiency number measured for the
real pipeline is bounded above by this probe: if the probe shows 0.5 at
8 -> 32 cores, the host (shared memory bandwidth / SMT vCPUs) — not the
engine — is the limiter at that size.

Usage: python scripts/host_ceiling_probe.py
"""

from __future__ import annotations

import json
import subprocess
import sys

WORKER = r'''
import os, sys, time, json
from pyspark.sql import SparkSession, functions as F
master = sys.argv[1]
spark = (SparkSession.builder.master(master)
         .config("spark.sql.shuffle.partitions","64")
         .config("spark.executor.memory","4g")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()  # warm
t0 = time.time()
if os.environ.get("PROBE", "codegen") == "strings":
    # memory-BANDWIDTH-bound probe: wide string construction + array
    # splits, the cache-hostile shape of the mention cascade (the
    # cache-resident md5 probe overstates what string-heavy work can
    # scale to on a shared bus)
    df = spark.range(0, 40_000_000, 1, 64)
    n = (df.withColumn("s", F.repeat(F.md5(F.col("id").cast("string")), 8))
           .withColumn("t", F.split(F.col("s"), "a"))
           .groupBy(F.substring("s", 1, 3))
           .agg(F.sum(F.size("t")).alias("z")).count())
else:
    df = spark.range(0, 400_000_000, 1, 64)
    n = (df.withColumn("k", F.md5(F.col("id").cast("string")))
           .groupBy(F.substring("k", 1, 4)).count().count())
print(json.dumps({"master": master, "sec": round(time.time() - t0, 1),
                  "n_groups": n}))
spark.stop()
'''

MASTERS = ["local[8]", "local[32]",
           "local-cluster[1,8,4096]", "local-cluster[4,8,4096]",
           "local-cluster[1,2,4096]", "local-cluster[4,2,4096]"]


def main() -> None:
    import os
    probe = os.environ.get("PROBE", "codegen")
    res = {}
    for m in MASTERS:
        out = subprocess.run([sys.executable, "-c", WORKER, m],
                             capture_output=True, text=True)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"{m}: FAILED {out.stderr[-300:]}", flush=True)
            continue
        res[m] = json.loads(line[-1])
        print(line[-1], flush=True)
    for lo, hi, f in [("local[8]", "local[32]", 4),
                      ("local-cluster[1,8,4096]", "local-cluster[4,8,4096]", 4),
                      ("local-cluster[1,2,4096]", "local-cluster[4,2,4096]", 4)]:
        if lo in res and hi in res:
            eff = res[lo]["sec"] / (res[hi]["sec"] * f)
            print(f"ceiling[{probe}] {lo} -> {hi}: efficiency {eff:.3f}")


if __name__ == "__main__":
    main()
