"""Measure the (pred, cell) layout payoff: point-radius serving query with
partition pruning vs the same query as a full edge-table scan.

Builds the graph once at $SPARK_GRAFT_SF_DIR (default sf0.1), then times
`nearby_edges` (pruned) against the unpruned reference for a handful of
query points. Appends nothing; prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from geo_linked_open_data_kg_spark.functions.geo import (  # noqa: E402
    coarse_cells_covering,
    haversine_km,
)
from geo_linked_open_data_kg_spark.operators.serving import (  # noqa: E402
    nearby_edges,
)
from geo_linked_open_data_kg_spark.plans.pipeline import (  # noqa: E402
    run_pipeline,
)
from geo_linked_open_data_kg_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    radius = float(os.environ.get("SPARK_GRAFT_SERVE_RADIUS_KM", "100"))
    n_points = int(os.environ.get("SPARK_GRAFT_SERVE_POINTS", "5"))
    spark = get_spark("serving_bench", cores=cpus,
                      shuffle_partitions=cpus * 8)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="kg_serve_")
    try:
        t0 = time.time()
        run_pipeline(spark, sf_dir, out_dir)["edges"].count()
        build_sec = round(time.time() - t0, 1)

        nodes = spark.read.parquet(f"{out_dir}/nodes").localCheckpoint()
        pts = (nodes.where(F.col("latitude").isNotNull())
               .orderBy("id").limit(n_points).collect())
        coords = (nodes.where(F.col("latitude").isNotNull())
                  .groupBy(F.col("id").alias("subj"))
                  .agg(F.min(F.struct("latitude", "longitude")).alias("c"))
                  .select("subj", F.col("c.latitude").alias("la"),
                          F.col("c.longitude").alias("lo")))

        coords = coords.localCheckpoint()  # both paths get prepped coords

        def files_under(path: str) -> int:
            n = 0
            for _, _, fs in os.walk(path):
                n += sum(1 for f in fs
                         if f.endswith(".parquet") and not f.startswith("_"))
            return n

        pred_files = files_under(f"{out_dir}/edges/pred=nearTo")
        table_files = files_under(f"{out_dir}/edges")

        pruned_s, full_s, n_rows, n_dirs, n_files = [], [], [], [], []
        for p in pts:
            qlat, qlon = float(p["latitude"]), float(p["longitude"])
            cells = coarse_cells_covering(qlat, qlon, radius)
            t0 = time.time()
            got = nearby_edges(spark, out_dir, "nearTo", qlat, qlon,
                               radius, nodes=nodes).collect()
            pruned_s.append(round(time.time() - t0, 3))

            t0 = time.time()
            ref = (spark.read.parquet(f"{out_dir}/edges")
                   .where(F.col("pred") == "nearTo")
                   .join(coords, "subj")
                   .withColumn("d", F.round(
                       haversine_km(F.col("la"), F.col("lo"),
                                    F.lit(qlat), F.lit(qlon)), 3))
                   .where(F.col("d") <= radius)
                   .collect())
            full_s.append(round(time.time() - t0, 3))

            assert len(got) == len(ref), (len(got), len(ref))
            n_rows.append(len(got))
            n_dirs.append(len(cells))
            n_files.append(sum(
                files_under(f"{out_dir}/edges/pred=nearTo/cell={c}")
                for c in cells))

        # at small SF the wall clock is scheduler overhead, so the number
        # that extrapolates to 100 TB is the FILE-PRUNING ratio: files a
        # pruned query opens vs the predicate dir vs the whole table
        print(json.dumps({
            "metric": "serving_nearby_edges",
            "sf_dir": sf_dir, "radius_km": radius,
            "build_sec": build_sec,
            "pruned_sec": pruned_s, "full_scan_sec": full_s,
            "rows": n_rows, "cell_dirs_scanned": n_dirs,
            "files_scanned": n_files,
            "files_in_pred_dir": pred_files,
            "files_in_table": table_files,
            "scan_fraction_vs_table": [
                round(f / max(table_files, 1), 4) for f in n_files],
        }))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
