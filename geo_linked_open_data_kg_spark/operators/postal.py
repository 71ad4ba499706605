"""J11 — conservative unique-match linking of the dated post-office CSV.

Reference: scripts/loaders/load_post_offices.py:76-100 (ambiguity
detection), :158-263 (match only when EXACTLY ONE gazetteer row matches
the normalized (name, province); ambiguous names must stay unmatched).

Spark shape: window-count ambiguity on BOTH sides before the join —
a post-office (norm_name, province) that appears more than once, or a
gazetteer (norm_name, admin1) with more than one place, never links.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.functions.scoring import normalize_name


def post_office_links(post_offices: DataFrame, places: DataFrame,
                      admin1_names: DataFrame) -> DataFrame:
    """(subj='po:<id>', pred='sameAs', obj='gn:<gid>', confidence 0.9,
    evidence 'unique_name_province')."""
    a1 = admin1_names.select(
        F.col("admin1_name").alias("province"),
        "country_code", "admin1_code")

    po = (post_offices
          .withColumn("norm_name", normalize_name(F.col("name")))
          .join(a1, "province", "inner"))
    po_key_w = Window.partitionBy("norm_name", "country_code", "admin1_code")
    po_unique = (po.withColumn("n_po", F.count("*").over(po_key_w))
                 .where(F.col("n_po") == 1))

    g = (places
         .where((F.col("feature_class") == "P")
                & F.col("admin1_code").isNotNull())
         .withColumn("norm_name", F.lower(F.trim(F.col("name")))))
    g_key_w = Window.partitionBy("norm_name", "country_code", "admin1_code")
    g_unique = (g.withColumn("n_g", F.count("*").over(g_key_w))
                .where(F.col("n_g") == 1)
                .select("norm_name", "country_code", "admin1_code",
                        "geoname_id"))

    return (po_unique.join(g_unique,
                           ["norm_name", "country_code", "admin1_code"])
            .select(F.concat(F.lit("po:"), F.col("id_number")).alias("subj"),
                    F.lit("sameAs").alias("pred"),
                    F.concat(F.lit("gn:"), F.col("geoname_id")).alias("obj"),
                    F.lit(0.9).alias("confidence"),
                    F.lit("unique_name_province").alias("evidence")))


def ambiguous_post_offices(post_offices: DataFrame) -> DataFrame:
    """A6: duplicate (norm_name, province) accounting
    (load_post_offices.py:76-100)."""
    po = post_offices.withColumn("norm_name", normalize_name(F.col("name")))
    return (po.groupBy("norm_name", "province")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > 1))
