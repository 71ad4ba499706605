"""S2/S3 — Wikidata NDJSON sources with claim extraction and entity gates.

Reference: scripts/parsers/filter_wikidata_full_dump.py (streaming gzip
line-JSON, tolerant of '[', ']' and trailing commas, :344-418; claim
extractors :59-125; P625 coordinate gate :160-172),
filter_wikidata_people.py:37-56 (P31=Q5 person gate),
filter_wikidata_organizations.py:33-64 (org-type gate),
parse_wikidata_dump.py:76-142 (time->date strings F10, label/alias
flattening F14), scripts/loaders/load_wikidata_entities.py:30-97
(metadata-header skip S3).

Spark shape: read as text (splittable across files), strip array
wrappers/trailing commas with Column ops, from_json with an explicit
claim schema — parse errors become null rows counted via aggregation,
not a Python try/except per line (A9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SNAK = T.StructType([
    T.StructField("mainsnak", T.StructType([
        T.StructField("datavalue", T.StructType([
            T.StructField("value", T.StructType([
                T.StructField("id", T.StringType()),
                T.StructField("latitude", T.DoubleType()),
                T.StructField("longitude", T.DoubleType()),
                T.StructField("time", T.StringType()),
                T.StructField("amount", T.StringType()),
            ])),
            T.StructField("type", T.StringType()),
        ])),
    ])),
])

ENTITY_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("labels", T.MapType(T.StringType(), T.StructType([
        T.StructField("language", T.StringType()),
        T.StructField("value", T.StringType())]))),
    T.StructField("aliases", T.MapType(T.StringType(), T.ArrayType(
        T.StructType([T.StructField("language", T.StringType()),
                      T.StructField("value", T.StringType())])))),
    T.StructField("claims", T.MapType(T.StringType(), T.ArrayType(SNAK))),
])

ORG_TYPE_QIDS = ["Q4830453", "Q43229", "Q891723", "Q783794", "Q6881511",
                 "Q161726", "Q484652", "Q31855", "Q875538", "Q3918",
                 "Q9842", "Q159334"]

# P9: the reference's 12-QID historical-entity set
# (filter_wikidata_full_dump.py:39-53)
HISTORICAL_TYPE_QIDS = ["Q133156", "Q1750636", "Q57821", "Q16748868",
                        "Q3024240", "Q28171280", "Q839954", "Q1266818",
                        "Q1620908", "Q15632617", "Q19953632", "Q19730508"]


def read_ndjson_entities(spark: SparkSession, path: str) -> DataFrame:
    """Tolerant NDJSON scan: drops '['/']' wrapper lines, strips trailing
    commas, counts parse failures (filter_wikidata_full_dump.py:344-418)."""
    lines = spark.read.text(path)
    cleaned = (lines
               .select(F.regexp_replace(F.trim(F.col("value")),
                                        r",$", "").alias("line"))
               .where(~F.col("line").isin("[", "]", "")))
    parsed = cleaned.select(
        F.from_json(F.col("line"), ENTITY_SCHEMA).alias("e"), "line")
    return parsed


def parse_error_counts(parsed: DataFrame) -> DataFrame:
    """A9: counter accumulation as a real aggregation."""
    return parsed.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("e").isNull() | F.col("e.id").isNull(), 1)
              .otherwise(0)).alias("parse_errors"))


def _claim_item(pid: str):
    """First VALID item claim: the reference appends only snaks whose
    datavalue carries an id, then takes the first
    (filter_wikidata_full_dump.py:212-220) — a leading novalue/somevalue
    snak must fall through to the next valid one, not yield NULL."""
    valid = F.filter(
        F.col("e.claims")[pid],
        lambda s: s["mainsnak"]["datavalue"]["value"]["id"].isNotNull())
    return valid[0]["mainsnak"]["datavalue"]["value"]["id"]


def _claim_time(pid: str):
    """F10: '+1858-11-01T00:00:00Z' -> '1858-11-01' (regex, lossy
    historical dates stay strings — parse_wikidata_dump.py:76-91).
    Same first-valid-snak guard as _claim_item."""
    valid = F.filter(
        F.col("e.claims")[pid],
        lambda s: s["mainsnak"]["datavalue"]["value"]["time"].isNotNull())
    t = valid[0]["mainsnak"]["datavalue"]["value"]["time"]
    return F.regexp_extract(t, r"^\+?(-?\d{1,4}-\d{2}-\d{2})", 1)


def _claim_string(pid: str):
    """String/external-id claims (e.g. P1566 GeoNames ID) store
    datavalue.value as a plain JSON string, which from_json's struct
    schema silently nulls out. The reference's _extract_string_value
    reads datavalue.value directly when type=='string'
    (filter_wikidata_full_dump.py:59-78); here we re-read it from the
    raw line with get_json_object, gated on the surviving `type` field.
    """
    dtype = F.col("e.claims")[pid][0]["mainsnak"]["datavalue"]["type"]
    raw = F.get_json_object(
        F.col("line"), f"$.claims.{pid}[0].mainsnak.datavalue.value")
    return F.when(dtype == "string", raw)


def _instance_of_list():
    """ALL valid P31 ids, in claim order — the reference collects every
    instance type, not just the first (filter_wikidata_full_dump.py:
    222-225); invalid (novalue/somevalue) snaks are dropped."""
    return F.filter(
        F.transform(
            F.coalesce(F.col("e.claims")["P31"],
                       F.array().cast("array<struct<mainsnak:struct<datavalue:"
                                      "struct<value:struct<id:string,latitude:"
                                      "double,longitude:double,time:string,"
                                      "amount:string>,type:string>>>>")),
            lambda s: s["mainsnak"]["datavalue"]["value"]["id"]),
        lambda x: x.isNotNull())


def extract_geo_entities(parsed: DataFrame) -> DataFrame:
    """P6 gate (must have P625 coordinate) + projection.
    filter_wikidata_full_dump.py:160-172,193-334."""
    e = parsed.where(F.col("e.id").isNotNull())
    coord = F.col("e.claims")["P625"][0]["mainsnak"]["datavalue"]["value"]
    label = F.coalesce(F.col("e.labels")["en"]["value"],
                       F.element_at(F.map_values(F.col("e.labels")), 1)["value"])
    # F14: alias flattening across languages, deduped, minus primary label
    aliases = F.array_except(
        F.array_distinct(F.flatten(F.transform(
            F.coalesce(F.map_values(F.col("e.aliases")),
                       F.array().cast(
                           "array<array<struct<language:string,value:string>>>")),
            lambda arr: F.transform(arr, lambda a: a["value"])))),
        F.array(label))
    out = (e.where(coord["latitude"].isNotNull())
           .select(F.col("e.id").alias("qid"),
                   label.alias("name"),
                   coord["latitude"].alias("latitude"),
                   coord["longitude"].alias("longitude"),
                   aliases.alias("alternate_names"),
                   _claim_item("P31").alias("instance_of_qid"),
                   _instance_of_list().alias("instance_of_qids"),
                   _claim_item("P17").alias("country_qid"),
                   # P1566 is an external-id (string-typed) claim in real
                   # dumps; struct-style encodings are kept as fallback
                   F.coalesce(
                       _claim_string("P1566"),
                       F.col("e.claims")["P1566"][0]["mainsnak"]["datavalue"]
                       ["value"]["id"]).alias("geonames_id"),
                   # P9: P31 ∩ historical set → flag
                   # (filter_wikidata_full_dump.py:222-225)
                   F.arrays_overlap(
                       _instance_of_list(),
                       F.array(*[F.lit(x) for x in HISTORICAL_TYPE_QIDS]))
                   .alias("is_historical"),
                   _claim_time("P571").alias("inception_date")))
    return out


def person_gate(parsed: DataFrame) -> DataFrame:
    """P7: instance-of Q5 AND at least one place property
    (filter_wikidata_people.py:37-56)."""
    inst = _instance_of_list()
    has_place = (
        F.col("e.claims")["P19"].isNotNull()
        | F.col("e.claims")["P20"].isNotNull()
        | F.col("e.claims")["P551"].isNotNull()
        | F.col("e.claims")["P937"].isNotNull()
        | F.col("e.claims")["P27"].isNotNull())
    return (parsed.where(F.col("e.id").isNotNull())
            .where(F.array_contains(inst, "Q5") & has_place)
            .select(F.col("e.id").alias("qid"),
                    F.col("e.labels")["en"]["value"].alias("name"),
                    _claim_item("P19").alias("birth_place_qid"),
                    _claim_item("P20").alias("death_place_qid"),
                    _claim_time("P569").alias("birth_date"),
                    _claim_time("P570").alias("death_date"),
                    _claim_item("P27").alias("citizenship_qid")))


def org_gate(parsed: DataFrame) -> DataFrame:
    """P8: P31 within the 12-QID org-type set AND a place property
    (filter_wikidata_organizations.py:33-64)."""
    inst = _instance_of_list()
    has_place = (F.col("e.claims")["P159"].isNotNull()
                 | F.col("e.claims")["P740"].isNotNull()
                 | F.col("e.claims")["P131"].isNotNull())
    return (parsed.where(F.col("e.id").isNotNull())
            .where(F.arrays_overlap(inst, F.array(
                *[F.lit(x) for x in ORG_TYPE_QIDS])) & has_place)
            .select(F.col("e.id").alias("qid"),
                    F.col("e.labels")["en"]["value"].alias("name"),
                    _claim_item("P159").alias("headquarters_qid"),
                    _claim_item("P740").alias("formation_location_qid"),
                    _claim_time("P571").alias("inception_date")))


def skip_metadata_header(spark: SparkSession, path: str) -> DataFrame:
    """S3: NDJSON with a metadata first line — rows where the payload's
    'id' is null are the header (load_wikidata_entities.py:30-45)."""
    parsed = read_ndjson_entities(spark, path)
    return parsed.where(F.col("e.id").isNotNull())
