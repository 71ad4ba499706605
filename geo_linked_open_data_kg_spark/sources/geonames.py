"""S1 — GeoNames TSV source with the reference's parse/filter semantics.

Reference: scripts/loaders/load_global_geonames.py —
19 positional fields (:44-50), int/float coercion with defaults (:63-119),
null-coordinate drop (:89-91), country include/exclude (:221-233),
feature-code class/specific filters (:186-196,242-251), alternate-names
comma split (:67-69), full feature code (:93-95).

Spark shape: one schema'd csv read + pure Column coercions — the
reference's 130-line streaming loop collapses into a declarative scan
that Catalyst pushes filters into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEONAMES_RAW_SCHEMA = T.StructType([
    T.StructField("geonameid", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("asciiname", T.StringType()),
    T.StructField("alternatenames", T.StringType()),
    T.StructField("latitude", T.StringType()),
    T.StructField("longitude", T.StringType()),
    T.StructField("feature_class", T.StringType()),
    T.StructField("feature_code", T.StringType()),
    T.StructField("country_code", T.StringType()),
    T.StructField("cc2", T.StringType()),
    T.StructField("admin1_code", T.StringType()),
    T.StructField("admin2_code", T.StringType()),
    T.StructField("admin3_code", T.StringType()),
    T.StructField("admin4_code", T.StringType()),
    T.StructField("population", T.StringType()),
    T.StructField("elevation", T.StringType()),
    T.StructField("dem", T.StringType()),
    T.StructField("timezone", T.StringType()),
    T.StructField("modification_date", T.StringType()),
])


def read_geonames_tsv(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.csv(path, sep="\t", schema=GEONAMES_RAW_SCHEMA,
                         header=False, mode="PERMISSIVE")
    return parse_geonames(raw)


def parse_geonames(raw: DataFrame) -> DataFrame:
    """P1/P2/F12/F17: typed projection with the reference's coercions."""
    alt = F.filter(
        F.transform(F.split(F.coalesce(F.col("alternatenames"), F.lit("")),
                            ","),
                    lambda x: F.trim(x)),
        lambda x: x != "")
    df = raw.select(
        F.coalesce(F.col("geonameid").try_cast("long"),
                   F.lit(0)).alias("geoname_id"),
        F.col("name"),
        F.coalesce(F.col("asciiname"), F.col("name")).alias("ascii_name"),
        alt.alias("alternate_names"),
        F.col("latitude").try_cast("double").alias("latitude"),
        F.col("longitude").try_cast("double").alias("longitude"),
        F.col("feature_class"), F.col("feature_code"),
        F.col("country_code"),
        F.when(F.col("admin1_code") == "", None)
         .otherwise(F.col("admin1_code")).alias("admin1_code"),
        F.when(F.col("admin2_code") == "", None)
         .otherwise(F.col("admin2_code")).alias("admin2_code"),
        F.when(F.col("admin3_code") == "", None)
         .otherwise(F.col("admin3_code")).alias("admin3_code"),
        F.when(F.col("admin4_code") == "", None)
         .otherwise(F.col("admin4_code")).alias("admin4_code"),
        F.coalesce(F.col("population").try_cast("long"),
                   F.lit(0)).alias("population"),
        F.coalesce(F.col("elevation").try_cast("long"),
                   F.lit(0)).alias("elevation"),
        F.col("timezone"),
        F.col("modification_date").alias("modified_date"),
    )
    # P2: rows without coordinates are useless for NER — drop
    df = df.where(F.col("latitude").isNotNull()
                  & F.col("longitude").isNotNull())
    # F17: full feature code 'P.PPL'
    return df.withColumn(
        "full_code", F.concat_ws(".", F.col("feature_class"),
                                 F.col("feature_code")))


def apply_filters(df: DataFrame,
                  countries: list[str] | None = None,
                  exclude_countries: list[str] | None = None,
                  include_codes: list[str] | None = None) -> DataFrame:
    """P3/P4: country include/exclude + feature-code filter. `include_codes`
    mixes class-level ('P') and specific ('S.CMTY') codes, parsed into two
    sets like load_global_geonames.py:186-196."""
    if countries:
        df = df.where(F.col("country_code").isin(countries))
    if exclude_countries:
        df = df.where(~F.col("country_code").isin(exclude_countries)
                      | F.col("country_code").isNull())
    if include_codes:
        classes = [c for c in include_codes if "." not in c]
        specific = [c for c in include_codes if "." in c]
        cond = F.lit(False)
        if classes:
            cond = cond | F.col("feature_class").isin(classes)
        if specific:
            cond = cond | F.col("full_code").isin(specific)
        df = df.where(cond)
    return df
