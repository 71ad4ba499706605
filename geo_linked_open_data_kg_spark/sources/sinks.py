"""K2/K3 — JSON sinks.

Reference: scripts/parsers/filter_wikidata_full_dump.py:336-367 (K2:
buffered gzip line-JSON writer with a metadata header) and
scripts/parsers/parse_lincs_historical_canadians.py:412-440 (K3:
whole-corpus JSON with a metadata+stats envelope).

Spark shape: the rows go through the distributed JSON writer
(`df.write.json`, gzip codec — splittable-on-read as many part files);
the metadata/stats envelope is a TINY driver-side artifact written once
next to the data, because a distributed writer has no "first line of the
corpus" to prepend to. Readers of the legacy single-file layout (metadata
line first) are handled by sources.wikidata.skip_metadata_header (S3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENVELOPE = "_envelope.json"


def _write_envelope(spark: SparkSession, path: str, payload: dict) -> None:
    """Write the tiny driver-side envelope through the Hadoop FS API so
    the sink works on whatever filesystem the data path names (HDFS, S3A,
    file:) — a local open() next to a distributed write breaks on any
    non-local scheme (round-2 ADVICE)."""
    jvm = spark._jvm
    jsc = spark._jsc
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, ENVELOPE))
    fs = p.getFileSystem(jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()


def write_ndjson_gz(df: DataFrame, path: str,
                    metadata: dict | None = None) -> None:
    """K2: gzip NDJSON sink. One line per row, nested columns as nested
    JSON objects; `metadata` lands in <path>/_envelope.json."""
    df.write.mode("overwrite").json(path, compression="gzip")
    if metadata is not None:
        _write_envelope(df.sparkSession, path, metadata)


def read_ndjson(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Round-trip reader for write_ndjson_gz output (codec inferred from
    the .gz extension; the envelope is not a part file so the JSON
    reader never sees it). Pass the table schema for an exact round trip
    — JSON inference alphabetizes struct fields and widens ints."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(os.path.join(path, "part-*"))


def write_json_documents(df: DataFrame, path: str,
                         metadata: dict | None = None) -> dict:
    """K3: corpus JSON export with a stats envelope. The reference dumps
    one giant {metadata, persons:[...]} file from memory — unwritable at
    corpus scale — so the rows stream through the distributed writer and
    the envelope carries the stats (row count + per-column null counts),
    computed as ONE aggregation OVER THE WRITTEN FILES (so stats always
    describe the exported rows, even for non-deterministic inputs, and
    the input is not recomputed twice). Returns the envelope dict."""
    df.write.mode("overwrite").json(path, compression="gzip")
    spark = df.sparkSession
    written = read_ndjson(spark, path, schema=df.schema)
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
        .alias(f"n_null_{c}") for c in df.columns]
    stats = written.agg(*aggs).collect()[0].asDict()
    envelope = {"metadata": metadata or {}, "stats": stats}
    _write_envelope(spark, path, envelope)
    return envelope
