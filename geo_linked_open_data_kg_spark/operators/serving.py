"""Point-radius serving queries over the materialized graph tables.

The (pred, cell) hive layout the pipeline writes (plans/pipeline.py:154-177,
the north rule's "partitioned by H3 cell and predicate") exists so that the
interactive read path never scans the full edge table: a "what is near this
point" lookup enumerates the handful of coarse grid boxes intersecting the
search disc (functions/geo.coarse_cells_covering — driver-side, O(cells))
and lets Catalyst turn (pred = X AND cell IN (...)) into PartitionFilters,
i.e. directory pruning BEFORE any file is opened. At 100 TB of edges in
~300 predicate x cell dirs per predicate, a 100 km query touches 1-4 cell
dirs of one predicate — a few thousandths of the table — regardless of
cluster size.

Reference analog: the Neo4j serving graph answers these with a POINT index
(scripts/linkers/link_spatial_optimized.py:35-55); here the layout IS the
index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.functions.geo import (
    coarse_cells_covering,
    haversine_km,
)


def nearby_edges(spark: SparkSession, graph_dir: str, pred: str,
                 lat: float, lon: float, radius_km: float,
                 nodes: DataFrame | None = None) -> DataFrame:
    """Edges of one predicate whose SUBJECT lies within radius_km of the
    query point, exact (haversine-refined) on top of partition pruning.

    Output: (subj, pred, obj, confidence, evidence, dist_km), dist_km
    rounded to 3 decimals. Pass `nodes` to reuse an already-loaded nodes
    DataFrame; otherwise reads `{graph_dir}/nodes`.
    """
    cells = coarse_cells_covering(lat, lon, radius_km)
    edges = (spark.read.parquet(f"{graph_dir}/edges")
             .where((F.col("pred") == pred)
                    & F.col("cell").isin([int(c) for c in cells])))
    nd = nodes if nodes is not None else \
        spark.read.parquet(f"{graph_dir}/nodes")
    # bounding-box prefilter BEFORE the aggregate/join: pure Column
    # predicates that reach the nodes parquet scan as PushedFilters, so
    # the coordinate dim shrinks from gazetteer-scale to disc-scale and
    # the broadcast below is justified at ANY corpus size. The box is
    # deliberately generous (degrees via the same conservative
    # KM_PER_DEG_LAT the grid uses); haversine refines exactly.
    import math
    r_deg = radius_km / 111.0
    dlon = min(180.0, r_deg / max(0.01, math.cos(math.radians(
        min(89.0, abs(lat) + r_deg)))))
    lat_ok = F.col("latitude").between(lat - r_deg, lat + r_deg)
    lo_w, hi_w = lon - dlon, lon + dlon
    if lo_w < -180.0 or hi_w > 180.0:  # antimeridian wrap: two windows
        lon_ok = (F.col("longitude") >= ((lo_w + 540.0) % 360.0 - 180.0)) \
            | (F.col("longitude") <= ((hi_w + 540.0) % 360.0 - 180.0))
    else:
        lon_ok = F.col("longitude").between(lo_w, hi_w)
    # one coordinate per subject id (same min-aggregation the writer used
    # to assign the layout cell, pipeline.py:166-171) so the refine join
    # can never duplicate an edge
    coords = (nd.where(F.col("latitude").isNotNull() & lat_ok & lon_ok)
              .groupBy(F.col("id").alias("subj"))
              .agg(F.min("latitude").alias("_lat"),
                   F.min("longitude").alias("_lon")))
    dist = haversine_km(F.col("_lat"), F.col("_lon"),
                        F.lit(float(lat)), F.lit(float(lon)))
    return (edges.join(F.broadcast(coords), "subj")
            .withColumn("dist_km", F.round(dist, 3))
            .where(F.col("dist_km") <= radius_km)
            .select("subj", "pred", "obj", "confidence", "evidence",
                    "dist_km"))


def ego_edges(spark: SparkSession, graph_dir: str, start_ids: list[str],
              k: int = 2, preds: list[str] | None = None) -> DataFrame:
    """The k-hop ego graph around a set of node ids — the MATCH
    (n)-[r*..k]-(m) read a Neo4j user runs against the reference's
    serving graph (undirected expansion, like Cypher's unanchored
    relationship pattern).

    Output: (subj, pred, obj, confidence, evidence, hop) where hop is
    the expansion round (1-based) that first reached the edge; each
    (subj, pred, obj) appears once. `preds` restricts the traversal to
    those predicates (and prunes the scan's partition dirs).

    Scale shape: the frontier is ego-graph-sized (thousands at most),
    so each hop is TWO broadcast-hash semi-joins against the edge scan
    (one per endpoint — an OR-condition join would degrade to a nested
    loop) union-deduped; zero shuffles of the full edge table, no
    driver-side edge materialization. The per-hop collect is the
    frontier's node ids only (bounded by the ego graph, never the
    corpus). Hub blow-ups are the caller's k to manage, not a hidden
    cap (no silent caps).
    """
    edges = spark.read.parquet(f"{graph_dir}/edges")
    if preds:
        edges = edges.where(F.col("pred").isin(list(preds)))
    edges = edges.select("subj", "pred", "obj", "confidence", "evidence")

    seen_nodes = {str(s) for s in start_ids}
    frontier = list(seen_nodes)
    out: DataFrame | None = None
    for hop in range(1, k + 1):
        if not frontier:
            break
        fr = F.broadcast(spark.createDataFrame(
            [(n,) for n in frontier], "node string"))
        hit = (edges.join(fr, edges.subj == fr.node, "left_semi")
               .unionByName(
                   edges.join(fr, edges.obj == fr.node, "left_semi"))
               .dropDuplicates(["subj", "pred", "obj"])
               .withColumn("hop", F.lit(hop))
               .localCheckpoint())  # pin: `edges` re-scan per consumer
        out = hit if out is None else (
            out.unionByName(hit.join(
                out.select("subj", "pred", "obj"),
                ["subj", "pred", "obj"], "left_anti")))
        out = out.localCheckpoint()
        reached = (hit.select(F.col("subj").alias("node"))
                   .unionByName(hit.select(F.col("obj").alias("node")))
                   .distinct().collect())
        frontier = [r["node"] for r in reached
                    if r["node"] not in seen_nodes]
        seen_nodes.update(frontier)
    if out is None:
        return spark.createDataFrame(
            [], "subj string, pred string, obj string, confidence double,"
                " evidence string, hop int")
    return out
