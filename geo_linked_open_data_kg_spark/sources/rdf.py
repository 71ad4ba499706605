"""S5 — RDF triple source, pre-flattened to a (s, p, o) DataFrame.

Reference: scripts/parsers/parse_lincs_historical_canadians.py:103-111
parses 186 MB of CIDOC-CRM Turtle into an in-memory rdflib graph and
walks it imperatively. Spark shape: triples live in a long-format
DataFrame; every traversal is a self-join (SURVEY.md §1.2). This module
parses the N-Triples subset (one triple per line) — enough to flatten
an exported graph — plus the URI id extractors (F15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# <s> <p> "literal" .  |  <s> <p> <o> .
_NT = r'^\s*<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|"((?:[^"\\]|\\.)*)")'


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path)
    m = lines.select(
        F.regexp_extract("value", _NT, 1).alias("s"),
        F.regexp_extract("value", _NT, 2).alias("p"),
        F.regexp_extract("value", _NT, 3).alias("o_uri"),
        F.regexp_extract("value", _NT, 4).alias("o_lit"))
    return (m.where(F.col("s") != "")
            .select("s", "p",
                    F.when(F.col("o_uri") != "", F.col("o_uri"))
                    .otherwise(F.col("o_lit")).alias("o"),
                    (F.col("o_uri") != "").alias("o_is_uri")))


def extract_uri_id(c) -> "F.Column":
    """F15: 'https://www.geonames.org/6093943l' -> 6093943 — first digit
    run, tolerating trailing garbage (parse_lincs_historical_canadians.py:
    54-73, PROJECT_STATUS.md:434-437)."""
    return F.regexp_extract(c, r"(\d+)", 1).try_cast("long")


def two_hop(triples: DataFrame, p1: str, p2: str, out_pred: str) -> DataFrame:
    """Graph traversal as a self-join: (a)-[p1]->(b)-[p2]->(c)."""
    t1 = triples.where(F.col("p") == p1).select(
        F.col("s").alias("subj"), F.col("o").alias("mid"))
    t2 = triples.where(F.col("p") == p2).select(
        F.col("s").alias("mid"), F.col("o").alias("obj"))
    return (t1.join(t2, "mid")
            .select("subj", F.lit(out_pred).alias("pred"), "obj")
            .distinct())
