"""Point-radius serving queries over the materialized graph tables.

The (pred, cell) hive layout the pipeline writes (plans/pipeline.py:154-177,
the north rule's "partitioned by H3 cell and predicate") exists so that the
interactive read path never scans the full edge table: a "what is near this
point" lookup enumerates the handful of coarse grid boxes intersecting the
search disc (functions/geo.coarse_cells_covering — driver-side, O(cells))
and lets Catalyst turn (pred = X AND cell IN (...)) into PartitionFilters,
i.e. directory pruning BEFORE any file is opened. The coarse grid has
288 cells (12 bands x 24 columns), so the table splits into at most
~290 dirs per predicate (+ the -1 coordinate-free dir); a 100 km query
touches 1-4 cell dirs of ONE predicate — a few thousandths of the table
at any corpus size (measured at sf0.1: 0-2 of 294 files per query,
scripts/serving_bench.py).

Reference analog: the Neo4j serving graph answers these with a POINT index
(scripts/linkers/link_spatial_optimized.py:35-55); here the layout IS the
index.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.functions.geo import (
    EARTH_RADIUS_KM,
    KM_PER_DEG_LAT,
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
    # ONE canonical coordinate per subject id — the lexicographic
    # struct-min, the SAME representative the writer's cell assignment
    # uses (pipeline.py:_edges), so a subject's layout partition and its
    # serving refine can never disagree (a componentwise min(lat),
    # min(lon) could name a coordinate no row has). Aggregate FIRST,
    # bbox-filter the aggregated dim AFTER: filtering rows before the
    # min would make the representative query-dependent for any id with
    # several coordinate rows. The null filter still pushes to the scan;
    # the dim this aggregates is the nodes table, orders of magnitude
    # smaller than the edge table the cell pruning is protecting.
    canon = F.min(F.struct("latitude", "longitude")).alias("c")
    coords = (nd.where(F.col("latitude").isNotNull())
              .groupBy(F.col("id").alias("subj")).agg(canon)
              .select("subj", F.col("c.latitude").alias("_lat"),
                      F.col("c.longitude").alias("_lon")))
    # generous bbox on the aggregated dim so the broadcast below stays
    # disc-sized at ANY corpus size; haversine refines exactly.
    # Longitude half-width via the rigorous haversine bound (the planar
    # r/(111*cos) width under-covers at high latitude — code review);
    # a disc that reaches a pole keeps every longitude.
    r_deg = radius_km / KM_PER_DEG_LAT
    lat_ok = F.col("_lat").between(lat - r_deg, lat + r_deg)
    phi_far = min(89.9, abs(lat) + r_deg)
    s = math.sin(min(radius_km / EARTH_RADIUS_KM, math.pi) / 2.0) \
        / max(1e-12, math.sqrt(math.cos(math.radians(min(abs(lat), 89.9)))
                               * math.cos(math.radians(phi_far))))
    if abs(lat) + r_deg >= 89.9 or s >= 1.0:
        lon_ok = F.lit(True)          # pole-crossing disc: full ring
    else:
        dlon = 2.0 * math.degrees(math.asin(s))
        lo_w, hi_w = lon - dlon, lon + dlon
        if lo_w < -180.0 or hi_w > 180.0:  # antimeridian wrap: 2 windows
            lon_ok = \
                (F.col("_lon") >= ((lo_w + 540.0) % 360.0 - 180.0)) \
                | (F.col("_lon") <= ((hi_w + 540.0) % 360.0 - 180.0))
        else:
            lon_ok = F.col("_lon").between(lo_w, hi_w)
    coords = coords.where(lat_ok & lon_ok)
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
