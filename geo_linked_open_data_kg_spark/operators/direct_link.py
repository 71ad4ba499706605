"""Direct-ID entity linking (reference J1/J2): WikidataPlace -> Place sameAs
triples via the geonames_id foreign key.

Reference: scripts/linkers/link_wikidata_places_global.py:42-88 (batched
Cypher join) and scripts/linkers/link_direct_geonames_ids.py:36-86 (the
string-vs-int cast bridge, incl. trailing-garbage ids like '6093943l',
PROJECT_STATUS.md:434-437 / F15 regexp id extraction).

Spark shape: one set-based equi-join. The gazetteer side is large -> the
join shuffles on the id; Catalyst picks SMJ/broadcast by stats. No per-batch
transaction loop: idempotency comes from the checkpointed output table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_geonames_id(c) -> "F.Column":
    """F15: tolerate trailing garbage — take the leading digit run."""
    return F.regexp_extract(c, r"^(\d+)", 1).try_cast("long")


EXTRACT_ID_SQL = "try_cast(regexp_extract({c}, '^(\\d+)', 1) AS BIGINT)"


def direct_id_links(wd: DataFrame, places: DataFrame) -> DataFrame:
    """(subj=qid, pred='sameAs', obj=geoname_id) at confidence 1.0."""
    w = (wd.where(F.col("geonames_id").isNotNull())
           .select("qid", extract_geonames_id(F.col("geonames_id")).alias("gid")))
    g = places.select(F.col("geoname_id").alias("gid"))
    return (
        w.join(g, "gid", "inner")
         .select(F.col("qid").alias("subj"),
                 F.lit("sameAs").alias("pred"),
                 F.concat(F.lit("gn:"), F.col("gid")).alias("obj"),
                 F.lit(1.0).alias("confidence"),
                 F.lit("geonames_id_match").alias("evidence"))
    )


def unlinked_wd(wd: DataFrame, links: DataFrame) -> DataFrame:
    """Anti-join work-remaining filter (J13/P10,
    link_wikidata_places_global.py:57-62,104-108)."""
    return wd.join(links.select(F.col("subj").alias("qid")), "qid", "left_anti")
