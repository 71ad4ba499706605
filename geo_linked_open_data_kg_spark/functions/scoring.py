"""Candidate-scoring functions (reference F2-F9), as pure Column expressions.

Every scorer here is whole-stage-codegen-able — no Python in the hot path.
The DuckDB-oracle SQL twins live next to each definition so the semantics
stay pinned in one place.

Reference formulas:
- name similarity: equality -> 1.0, containment -> 0.8, else
  0.5 * |token overlap| / max(|tokens|)   (link_by_geography.py:163-179)
- distance ladder: <=0.1 -> 1.0, <=1 -> 0.9, <=5 -> 0.7, <=10 -> 0.5,
  else 0.3                                (link_by_geography.py:151-161)
- confidence = 0.30*dist + 0.50*name + 0.20*type, clamped to 1.0
                                          (link_by_geography.py:138-196)
- edge classification: conf>=0.85 & d<=1km -> sameAs;
  src_prio<60 & dst_prio>=60 & d<=5km -> locatedIn; else nearTo
                                          (link_wikidata_places_global.py:327-349)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _tokens(c: Column) -> Column:
    return F.array_distinct(F.split(F.lower(F.trim(c)), " +"))


def name_similarity(a: Column, b: Column) -> Column:
    la, lb = F.lower(F.trim(a)), F.lower(F.trim(b))
    ta, tb = _tokens(a), _tokens(b)
    overlap = F.size(F.array_intersect(ta, tb))
    denom = F.greatest(F.size(ta), F.size(tb))
    return (
        F.when(la == lb, F.lit(1.0))
        .when(la.contains(lb) | lb.contains(la), F.lit(0.8))
        .otherwise(0.5 * overlap.cast("double") /
                   F.greatest(denom, F.lit(1)).cast("double"))
    )


NAME_SIM_SQL = (
    "CASE WHEN lower(trim({a})) = lower(trim({b})) THEN 1.0 "
    "WHEN position(lower(trim({b})) IN lower(trim({a}))) > 0 "
    "  OR position(lower(trim({a})) IN lower(trim({b}))) > 0 THEN 0.8 "
    "ELSE 0.5 * len(list_intersect("
    "  list_distinct(regexp_split_to_array(lower(trim({a})), ' +')), "
    "  list_distinct(regexp_split_to_array(lower(trim({b})), ' +')))) "
    " / greatest(greatest("
    "  len(list_distinct(regexp_split_to_array(lower(trim({a})), ' +'))), "
    "  len(list_distinct(regexp_split_to_array(lower(trim({b})), ' +')))), 1) END"
)


def distance_score(dist_km: Column) -> Column:
    return (
        F.when(dist_km <= 0.1, 1.0)
        .when(dist_km <= 1.0, 0.9)
        .when(dist_km <= 5.0, 0.7)
        .when(dist_km <= 10.0, 0.5)
        .otherwise(0.3)
    )


DIST_SCORE_SQL = (
    "CASE WHEN {d} <= 0.1 THEN 1.0 WHEN {d} <= 1.0 THEN 0.9 "
    "WHEN {d} <= 5.0 THEN 0.7 WHEN {d} <= 10.0 THEN 0.5 ELSE 0.3 END"
)


def confidence(dist_score_c: Column, name_sim_c: Column, type_score_c: Column) -> Column:
    return F.least(
        F.lit(1.0),
        0.30 * dist_score_c + 0.50 * name_sim_c + 0.20 * type_score_c)


CONFIDENCE_SQL = "least(1.0, 0.30*{ds} + 0.50*{ns} + 0.20*{ts})"


def classify_edge(conf: Column, dist_km: Column,
                  src_priority: Column, dst_priority: Column) -> Column:
    return (
        F.when((conf >= 0.85) & (dist_km <= 1.0), F.lit("sameAs"))
        .when((src_priority < 60) & (dst_priority >= 60) & (dist_km <= 5.0),
              F.lit("locatedIn"))
        .otherwise(F.lit("nearTo"))
    )


CLASSIFY_SQL = (
    "CASE WHEN {conf} >= 0.85 AND {d} <= 1.0 THEN 'sameAs' "
    "WHEN {sp} < 60 AND {dp} >= 60 AND {d} <= 5.0 THEN 'locatedIn' "
    "ELSE 'nearTo' END"
)


def population_weight(pop: Column) -> Column:
    """link_hgis_to_lod.py:162-179."""
    return (
        F.when(pop >= 100000, 1.3)
        .when(pop >= 10000, 1.2)
        .when(pop >= 1000, 1.1)
        .otherwise(1.0)
    )


POP_WEIGHT_SQL = (
    "CASE WHEN {p} >= 100000 THEN 1.3 WHEN {p} >= 10000 THEN 1.2 "
    "WHEN {p} >= 1000 THEN 1.1 ELSE 1.0 END"
)


def hgis_distance_score(d: Column) -> Column:
    """HGIS exponential-decay distance ladder
    (link_hgis_to_lod.py:243-256) — distinct from the F3 ladder."""
    return (
        F.when(d <= 0.5, 1.0)
        .when(d <= 2.0, 0.9)
        .when(d <= 5.0, 0.75)
        .when(d <= 10.0, 0.5)
        .when(d <= 25.0, 0.3)
        .otherwise(0.1)
    )


HGIS_DIST_SQL = (
    "CASE WHEN {d} <= 0.5 THEN 1.0 WHEN {d} <= 2.0 THEN 0.9 "
    "WHEN {d} <= 5.0 THEN 0.75 WHEN {d} <= 10.0 THEN 0.5 "
    "WHEN {d} <= 25.0 THEN 0.3 ELSE 0.1 END"
)


def hgis_name_score(target: Column, cand: Column) -> Column:
    """HGIS name component (link_hgis_to_lod.py:262-281): equality 1.0,
    containment 0.8, else 0.5 * |overlap| / |target tokens| (target-side
    denominator — unlike F2's max-side)."""
    lt, lc = F.lower(F.trim(target)), F.lower(F.trim(cand))
    tt, tc = _tokens(target), _tokens(cand)
    overlap = F.size(F.array_intersect(tt, tc))
    return (
        F.when(lt == lc, F.lit(1.0))
        .when(lt.contains(lc) | lc.contains(lt), F.lit(0.8))
        .otherwise(0.5 * overlap.cast("double")
                   / F.greatest(F.size(tt), F.lit(1)).cast("double"))
    )


HGIS_NAME_SQL = (
    "CASE WHEN lower(trim({t})) = lower(trim({c})) THEN 1.0 "
    "WHEN position(lower(trim({c})) IN lower(trim({t}))) > 0 "
    "  OR position(lower(trim({t})) IN lower(trim({c}))) > 0 THEN 0.8 "
    "ELSE 0.5 * len(list_intersect("
    "  list_distinct(regexp_split_to_array(lower(trim({t})), ' +')), "
    "  list_distinct(regexp_split_to_array(lower(trim({c})), ' +')))) "
    " / greatest(len(list_distinct("
    "  regexp_split_to_array(lower(trim({t})), ' +'))), 1) END"
)


def hgis_confidence(ds: Column, ts: Column, ns: Column,
                    pw: Column) -> Column:
    """4-factor HGIS score: 0.40 distance + 0.35 entity-type + 0.15 name
    + 0.10 population boost, clamped (link_hgis_to_lod.py:283-307)."""
    return F.least(F.lit(1.0),
                   0.40 * ds + 0.35 * ts + 0.15 * ns + 0.10 * (pw - 1.0))


HGIS_CONFIDENCE_SQL = (
    "least(1.0, 0.40*{ds} + 0.35*{ts} + 0.15*{ns} + 0.10*({pw} - 1.0))"
)


def normalize_name(c: Column) -> Column:
    """Post-office name normalization F1 (load_post_offices.py:66-74)."""
    x = F.lower(F.trim(c))
    x = F.regexp_replace(x, r"\s+(post office|p\.o\.|po)$", "")
    return F.trim(x)


NORMALIZE_NAME_SQL = (
    "trim(regexp_replace(lower(trim({c})), '\\s+(post office|p\\.o\\.|po)$', ''))"
)
