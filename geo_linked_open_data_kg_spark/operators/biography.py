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
