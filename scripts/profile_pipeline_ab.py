"""Round-6 interleaved A/B of AQE/agg configs on the full pipeline.

Each variant gets its own session (configs are session-wide); variants
alternate A/B/A/B across processes is not possible in-process, so we
run each variant's pipeline `SHOTS` times in its session and compare
medians; run the script twice in opposite order to control for drift.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHOTS = int(os.environ.get("AB_SHOTS", "3"))

VARIANTS = {
    "base": {},
    "adv8m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
    "adv8m+objhash": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold":
            "4000000",
    },
}


def run_variant(name: str, conf: dict) -> None:
    b = (SparkSession.builder.master("local[32]").appName(f"ab_{name}")
         .config("spark.sql.shuffle.partitions", "256")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.io.compression.codec", "zstd")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.files.openCostInBytes", "131072")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false"))
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geo_linked_open_data_kg_spark.plans.pipeline import run_pipeline
    per = []
    for _ in range(SHOTS):
        d = tempfile.mkdtemp(prefix="kg_ab_")
        t0 = time.time()
        try:
            run_pipeline(spark, SF_DIR, d)["canonical_triples"].count()
        finally:
            shutil.rmtree(d, ignore_errors=True)
        per.append(round(time.time() - t0, 2))
        spark.catalog.clearCache()
    print(f"{name:16s} shots={per} median={statistics.median(per)}",
          flush=True)
    spark.stop()


def main() -> None:
    order = sys.argv[1:] or list(VARIANTS)
    for name in order:
        run_variant(name, VARIANTS[name])


if __name__ == "__main__":
    main()
