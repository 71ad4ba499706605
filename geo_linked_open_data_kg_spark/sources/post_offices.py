"""S4 — post-office CSV source with date coercion.

Reference: scripts/loaders/load_post_offices.py:37-64 — pandas
read_csv + to_datetime(errors='coerce', format='mixed') + derived year
+ is_open flag (:127).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_post_office_csv(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.csv(path, header=True)
    return parse_post_offices(raw)


def parse_post_offices(raw: DataFrame) -> DataFrame:
    """F11: tolerant timestamp parse (try_to_timestamp == errors='coerce'),
    derived year, is_open when no closing date."""
    est = F.coalesce(
        F.try_to_timestamp(F.col("EstablishedDate")),
        F.try_to_timestamp(F.col("EstablishedDate"), F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(F.col("EstablishedDate"), F.lit("MM/dd/yyyy")))
    clo = F.coalesce(
        F.try_to_timestamp(F.col("ClosingDate")),
        F.try_to_timestamp(F.col("ClosingDate"), F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(F.col("ClosingDate"), F.lit("MM/dd/yyyy")))
    return raw.select(
        F.col("IdNumber").try_cast("long").alias("id_number"),
        F.col("Name").alias("name"),
        F.col("Province").alias("province"),
        est.alias("established_date"),
        clo.alias("closing_date"),
        F.year(est).alias("established_year"),
        clo.isNull().alias("is_open"))
