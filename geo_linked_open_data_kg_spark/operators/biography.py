"""Biographical edges (reference J3/J12/J14/G5/A8).

Reference: ENTITY_LINKING_PLAN_UPDATED.md:106-221 (BORN_IN / DIED_IN /
RESIDED_IN / CITIZEN_OF / HEADQUARTERED_IN plans), executed there as
per-batch Cypher; here each is one equi-join. Array-valued FKs explode
first (J12, load_indian_affairs_agents.py:112-119). Dangling FKs are
counted via anti-join, not silently joined away (G4 semantics,
fetch_wikidata_p131_relationships.py:120-160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fk_edges(persons: DataFrame, wd: DataFrame, fk: str, pred: str,
              subj_col: str = "qid") -> DataFrame:
    return (persons
            .where(F.col(fk).isNotNull())
            .join(wd.select(F.col("qid").alias(fk)), fk, "inner")
            .select(F.col(subj_col).alias("subj"),
                    F.lit(pred).alias("pred"),
                    F.col(fk).alias("obj"),
                    F.lit(1.0).alias("confidence"),
                    F.lit("wikidata_claim").alias("evidence")))


def born_in(persons: DataFrame, wd: DataFrame) -> DataFrame:
    return _fk_edges(persons, wd, "birth_place_qid", "bornIn")


def died_in(persons: DataFrame, wd: DataFrame) -> DataFrame:
    return _fk_edges(persons, wd, "death_place_qid", "diedIn")


def resided_in(persons: DataFrame, wd: DataFrame) -> DataFrame:
    """J12: explode the residence array then equi-join."""
    ex = (persons.select("qid", F.explode("residence_qids").alias("res_qid"))
          .distinct())
    return (ex.join(wd.select(F.col("qid").alias("res_qid")), "res_qid")
            .select(F.col("qid").alias("subj"),
                    F.lit("residedIn").alias("pred"),
                    F.col("res_qid").alias("obj"),
                    F.lit(1.0).alias("confidence"),
                    F.lit("wikidata_claim").alias("evidence")))


def worked_at(persons: DataFrame, wd: DataFrame) -> DataFrame:
    ex = (persons.select("qid", F.explode("work_location_qids").alias("w_qid"))
          .distinct())
    return (ex.join(wd.select(F.col("qid").alias("w_qid")), "w_qid")
            .select(F.col("qid").alias("subj"),
                    F.lit("workedAt").alias("pred"),
                    F.col("w_qid").alias("obj"),
                    F.lit(1.0).alias("confidence"),
                    F.lit("wikidata_claim").alias("evidence")))


def headquartered_in(orgs: DataFrame, wd: DataFrame) -> DataFrame:
    return _fk_edges(orgs, wd, "headquarters_qid", "headquarteredIn")


def founded_in(orgs: DataFrame, wd: DataFrame) -> DataFrame:
    """FOUNDED edge from P740 formation location — planned alongside
    HEADQUARTERED_IN (ENTITY_LINKING_PLAN_UPDATED.md:187-198; gate
    includes P740 at filter_wikidata_organizations.py:33-64)."""
    return _fk_edges(orgs, wd, "formation_location_qid", "foundedIn")


def spouse_pairs(persons: DataFrame) -> DataFrame:
    """SPOUSE_OF with canonical-pair dedup: the reference builds
    tuple(sorted([a, b])) into a set so each marriage is emitted once
    even when recorded on both spouses' rows
    (load_lincs_historical_canadians.py:232-237,263-276); here
    least/greatest + dropDuplicates. Both spouses must exist (the
    reference's MATCH..MATCH gate)."""
    ex = (persons.select("qid", F.explode("spouse_qids").alias("sp"))
          .where(F.col("sp") != F.col("qid")))
    known = persons.select(F.col("qid").alias("sp"))
    return (ex.join(known, "sp", "left_semi")
            .select(F.least("qid", "sp").alias("subj"),
                    F.lit("spouseOf").alias("pred"),
                    F.greatest("qid", "sp").alias("obj"),
                    F.lit(1.0).alias("confidence"),
                    F.lit("family_record").alias("evidence"))
            .dropDuplicates(["subj", "obj"]))


def parent_of(persons: DataFrame) -> DataFrame:
    """PARENT_OF parent->child with parentType evidence; both endpoints
    must exist (load_lincs_historical_canadians.py:213-230,242-256)."""
    out = []
    for fk, ptype in (("mother_qid", "mother"), ("father_qid", "father")):
        known = persons.select(F.col("qid").alias(fk))
        e = (persons.where(F.col(fk).isNotNull())
             .join(known, fk, "left_semi")
             .select(F.col(fk).alias("subj"),
                     F.lit("parentOf").alias("pred"),
                     F.col("qid").alias("obj"),
                     F.lit(1.0).alias("confidence"),
                     F.lit(ptype).alias("evidence")))
        out.append(e)
    return out[0].unionByName(out[1]).dropDuplicates(
        ["subj", "obj", "evidence"])


def citizen_of(persons: DataFrame, wd: DataFrame) -> DataFrame:
    """CITIZEN_OF via P27 (ENTITY_LINKING_PLAN_UPDATED.md:161-171);
    citizenship must resolve to a country some known place belongs to
    (the country-QID domain of the gazetteer)."""
    countries = wd.select(F.col("country_qid").alias("citizenship_qid")) \
        .where(F.col("citizenship_qid").isNotNull()).distinct()
    return (persons.where(F.col("citizenship_qid").isNotNull())
            .join(F.broadcast(countries), "citizenship_qid", "left_semi")
            .select(F.col("qid").alias("subj"),
                    F.lit("citizenOf").alias("pred"),
                    F.col("citizenship_qid").alias("obj"),
                    F.lit(1.0).alias("confidence"),
                    F.lit("wikidata_claim").alias("evidence")))


def dangling_fk_counts(persons: DataFrame, wd: DataFrame) -> DataFrame:
    """G4 accounting: birth/death FKs with no matching entity, counted
    (not joined). Columns: (fk, n_dangling)."""
    out = []
    for fk in ("birth_place_qid", "death_place_qid"):
        d = (persons.where(F.col(fk).isNotNull())
             .join(wd.select(F.col("qid").alias(fk)), fk, "left_anti")
             .agg(F.count("*").alias("n_dangling"))
             .select(F.lit(fk).alias("fk"), "n_dangling"))
        out.append(d)
    return out[0].unionByName(out[1])


def born_in_place(persons: DataFrame, wd: DataFrame,
                  same_as: DataFrame) -> DataFrame:
    """J14/G5: 2-hop composition bornIn ∘ sameAs -> bornInPlace
    (ENTITY_LINKING_PLAN_UPDATED.md:203-222)."""
    b = born_in(persons, wd).select(F.col("subj").alias("person"),
                                    F.col("obj").alias("wd_place"))
    s = same_as.select(F.col("subj").alias("wd_place"),
                       F.col("obj").alias("place"))
    return (b.join(s, "wd_place")
            .select(F.col("person").alias("subj"),
                    F.lit("bornInPlace").alias("pred"),
                    F.col("place").alias("obj"),
                    F.lit(1.0).alias("confidence"),
                    F.lit("derived_2hop").alias("evidence"))
            .distinct())


def migration_flows(persons: DataFrame, wd: DataFrame,
                    min_count: int = 2) -> DataFrame:
    """A8: birth-country -> death-country flow counts
    (visualize_migrations.py:53-109). Country resolved through the
    wikidata place's country_qid."""
    place_cc = wd.select("qid", "country_qid")
    b = (persons.where(F.col("birth_place_qid").isNotNull()
                       & F.col("death_place_qid").isNotNull())
         .join(place_cc.select(F.col("qid").alias("birth_place_qid"),
                               F.col("country_qid").alias("birth_country")),
               "birth_place_qid")
         .join(place_cc.select(F.col("qid").alias("death_place_qid"),
                               F.col("country_qid").alias("death_country")),
               "death_place_qid"))
    return (b.groupBy("birth_country", "death_country")
            .agg(F.count("*").alias("n_persons"))
            .where(F.col("n_persons") >= min_count))
