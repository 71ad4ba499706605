"""Spatial linking (reference J5/J6/G1/G2): cell-bucketed range join with
top-k refinement and edge-type classification.

Reference: scripts/linkers/link_spatial_optimized.py — a per-row Python loop
issuing one bbox+distance Cypher query per source place (3.6 s/place naive,
0.1 s/place optimized, SPATIAL_LINKING_OPTIMIZED.md:5-13,78-94). Spark shape:

    probe (wd places)  --cover_cells(radius)--> explode -> equi-join on cell
    build (gazetteer)  --cell_id-------------->
    -> haversine refine (pure Column)  -> score (F2-F5)  -> window top-k (J6)
    -> classify sameAs/locatedIn/nearTo (G1)

The equi-join on cell id is a plain shuffle join: AQE skew-join splits hot
urban cells; no per-country driver loop. Each (probe,build) pair appears at
most once because the build side maps to exactly one cell.

Determinism: candidate ranking is totally ordered (confidence DESC,
distance ASC, geoname_id ASC) — the reference relied on implicit DB order
(link_spatial_optimized.py:244-246).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.functions.geo import (
    cell_id,
    haversine_km,
    make_cover_cells_udf,
)
from geo_linked_open_data_kg_spark.functions.scoring import (
    classify_edge,
    confidence,
    distance_score,
    hgis_confidence,
    hgis_distance_score,
    hgis_name_score,
    name_similarity,
    population_weight,
)


def spatial_candidates(wd: DataFrame, places: DataFrame,
                       feature_priority: DataFrame,
                       wd_type_priority: DataFrame,
                       radius_km: float = 10.0) -> DataFrame:
    """All (wd place, gazetteer place) pairs within radius_km, scored.

    Returns columns: qid, geoname_id, distance_km, name_sim, dist_score,
    type_score, conf, wd_priority, gn_priority.
    """
    cover = make_cover_cells_udf(radius_km)
    # multi-typed entities: wd_priority = MAX type priority over ALL P31
    # claims (filter_wikidata_full_dump.py:222-225 collects every type;
    # first-claim-only mis-prioritizes when the dominant type isn't
    # first). The dim is tiny (dozens of rows) so it rides the plan as a
    # literal map — zero joins, stays inside whole-stage codegen. Falls
    # back to the scalar broadcast-join path for legacy single-type input.
    multi_type = "instance_of_qids" in wd.columns
    type_cols = ["instance_of_qids"] if multi_type else ["instance_of_qid"]
    probe = (wd
             .select("qid", F.col("name").alias("wd_name"),
                     F.col("latitude").alias("wd_lat"),
                     F.col("longitude").alias("wd_lon"),
                     *type_cols)
             .withColumn("cell", F.explode(cover("wd_lat", "wd_lon"))))
    build = (places
             .select("geoname_id", F.col("name").alias("gn_name"),
                     F.col("latitude").alias("gn_lat"),
                     F.col("longitude").alias("gn_lon"),
                     "feature_code", "population")
             .withColumn("cell", cell_id("gn_lat", "gn_lon")))

    pairs = (probe.join(build, "cell")
             .withColumn("distance_km",
                         haversine_km(F.col("wd_lat"), F.col("wd_lon"),
                                      F.col("gn_lat"), F.col("gn_lon")))
             .where(F.col("distance_km") <= radius_km))

    # priorities via broadcast lookups (F5) — tiny dims, no shuffle
    pairs = (pairs
             .join(F.broadcast(feature_priority.withColumnRenamed(
                 "priority", "gn_priority")), "feature_code", "left")
             .fillna({"gn_priority": 50}))
    if multi_type:
        prio = {r["instance_of_qid"]: int(r["priority"])
                for r in wd_type_priority.collect()}
        pmap = F.create_map(
            *[F.lit(x) for kv in sorted(prio.items()) for x in kv])
        pairs = pairs.withColumn(
            "wd_priority",
            F.coalesce(
                F.array_max(F.filter(
                    F.transform(F.col("instance_of_qids"),
                                lambda q: F.try_element_at(pmap, q)),
                    lambda p: p.isNotNull())),
                F.lit(50)).cast("long"))
    else:
        pairs = (pairs
                 .join(F.broadcast(wd_type_priority.withColumnRenamed(
                     "priority", "wd_priority")), "instance_of_qid", "left")
                 .fillna({"wd_priority": 50}))

    ns = name_similarity(F.col("wd_name"), F.col("gn_name"))
    ds = distance_score(F.col("distance_km"))
    ts = F.col("gn_priority").cast("double") / 100.0
    return (pairs
            .withColumn("name_sim", ns)
            .withColumn("dist_score", ds)
            .withColumn("type_score", ts)
            .withColumn("conf", confidence(F.col("dist_score"),
                                           F.col("name_sim"),
                                           F.col("type_score"))))


def spatial_links(wd: DataFrame, places: DataFrame,
                  feature_priority: DataFrame, wd_type_priority: DataFrame,
                  radius_km: float = 10.0, k: int = 5,
                  min_confidence: float = 0.5) -> DataFrame:
    """Top-k candidates per wd place -> classified triples (G1).

    Output: (subj, pred, obj, confidence, distance_km, evidence, rank).
    """
    cands = spatial_candidates(wd, places, feature_priority, wd_type_priority,
                               radius_km)
    w = (Window.partitionBy("qid")
         .orderBy(F.col("conf").desc(), F.col("distance_km").asc(),
                  F.col("geoname_id").asc()))
    topk = (cands
            .withColumn("rank", F.row_number().over(w))
            .where((F.col("rank") <= k) & (F.col("conf") >= min_confidence)))
    return topk.select(
        F.col("qid").alias("subj"),
        classify_edge(F.col("conf"), F.col("distance_km"),
                      F.col("wd_priority"), F.col("gn_priority")).alias("pred"),
        F.concat(F.lit("gn:"), F.col("geoname_id")).alias("obj"),
        F.round(F.col("conf"), 4).alias("confidence"),
        F.round(F.col("distance_km"), 4).alias("distance_km"),
        F.lit("spatial_proximity").alias("evidence"),
        F.col("rank"))


def hgis_links(points: DataFrame, places: DataFrame,
               feature_priority: DataFrame, radius_km: float = 25.0,
               k: int = 5, min_confidence: float = 0.6,
               min_entity_score: int = 40) -> DataFrame:
    """HGIS-style 4-factor point linking (link_hgis_to_lod.py:231-330):
    candidates within radius, POIs/buildings filtered by entity-type
    priority (< min_entity_score — the Toronto-vs-CN-Tower guard), then
    0.40 distance + 0.35 type + 0.15 name + 0.10 population-boost,
    top-k per point above min_confidence.

    `points` columns: (point_id, name, latitude, longitude). Same
    cell-bucketed join shape as spatial_links — one shuffle on cell id,
    broadcast priority dim, window top-k.
    Output: (subj, pred='hgisMatch', obj, confidence, distance_km, rank).
    """
    cover = make_cover_cells_udf(radius_km)
    probe = (points
             .select("point_id", F.col("name").alias("hg_name"),
                     F.col("latitude").alias("hg_lat"),
                     F.col("longitude").alias("hg_lon"))
             .withColumn("cell", F.explode(cover("hg_lat", "hg_lon"))))
    build = (places
             .select("geoname_id", F.col("name").alias("gn_name"),
                     F.col("latitude").alias("gn_lat"),
                     F.col("longitude").alias("gn_lon"),
                     "feature_code", "feature_class", "population")
             .withColumn("cell", cell_id("gn_lat", "gn_lon")))
    # entity score: priority dim, else the feature-class fallback ladder
    # (link_hgis_to_lod.py:120-144)
    class_fallback = (F.when(F.col("feature_class") == "P", 50)
                      .when(F.col("feature_class") == "A", 60)
                      .when(F.col("feature_class") == "L", 55)
                      .otherwise(30))
    pairs = (probe.join(build, "cell")
             .withColumn("distance_km",
                         haversine_km(F.col("hg_lat"), F.col("hg_lon"),
                                      F.col("gn_lat"), F.col("gn_lon")))
             .where(F.col("distance_km") <= radius_km)
             .join(F.broadcast(feature_priority.withColumnRenamed(
                 "priority", "fp")), "feature_code", "left")
             .withColumn("entity_score",
                         F.coalesce(F.col("fp"), class_fallback)
                         .cast("long"))
             .where(F.col("entity_score") >= min_entity_score))
    conf = hgis_confidence(
        hgis_distance_score(F.col("distance_km")),
        F.col("entity_score").cast("double") / 100.0,
        hgis_name_score(F.col("hg_name"), F.col("gn_name")),
        population_weight(F.col("population")))
    # the 4-factor sum of 2dp weights lands EXACTLY on .00005 rounding
    # boundaries, where last-ulp noise differs across engines; rank,
    # threshold and display all use the same epsilon-shifted 4dp rounding
    # so ties and boundaries resolve identically everywhere
    scored = pairs.withColumn("conf", F.round(conf + 1e-9, 4))
    w = (Window.partitionBy("point_id")
         .orderBy(F.col("conf").desc(), F.col("distance_km").asc(),
                  F.col("geoname_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where((F.col("rank") <= k)
                   & (F.col("conf") >= min_confidence))
            .select(F.col("point_id").alias("subj"),
                    F.lit("hgisMatch").alias("pred"),
                    F.concat(F.lit("gn:"), F.col("geoname_id")).alias("obj"),
                    F.col("conf").alias("confidence"),
                    F.round(F.col("distance_km"), 4).alias("distance_km"),
                    F.col("rank")))


def promote_near_to_same_as(links: DataFrame) -> DataFrame:
    """G2: upgrade NEAR edges with conf>=0.85 & d<=1km
    (link_by_geography.py:305-330)."""
    return links.withColumn(
        "pred",
        F.when((F.col("pred") == "nearTo") & (F.col("confidence") >= 0.85)
               & (F.col("distance_km") <= 1.0), F.lit("sameAs"))
        .otherwise(F.col("pred")))
