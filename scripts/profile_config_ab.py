"""Round-6 config A/B: input-split floor and AQE coalesce floor vs the
detection hot stages. One Spark session per variant (configs are
session-wide), same stages, 2 shots each.

Usage: python scripts/profile_config_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

VARIANTS = {
    "baseline": {},
    "splits": {"spark.sql.files.openCostInBytes": "131072"},
    "splits+coalesce": {
        "spark.sql.files.openCostInBytes": "131072",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    },
}


def run_variant(name: str, conf: dict) -> None:
    b = (SparkSession.builder.master(f"local[{CPUS}]")
         .appName(f"ab_{name}")
         .config("spark.sql.shuffle.partitions", str(CPUS * 8))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.io.compression.codec", "zstd")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false"))
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geo_linked_open_data_kg_spark.operators import linking, mentions
    from geo_linked_open_data_kg_spark.sources.registry import load

    docs = load(spark, SF_DIR, "geo_documents")
    places = load(spark, SF_DIR, "places")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn, shots=2):
        per = []
        for _ in range(shots):
            t0 = time.time()
            fn()
            per.append(round(time.time() - t0, 2))
        print(f"{name:16s} {label:24s} {per}", flush=True)

    spans = mentions.text_spans(docs)
    am = mentions.alias_map(places)
    grams = (mentions.pruned_ngram_candidates(
        spans, mentions.alias_first_tokens(am))
        .where(F.length("gram_norm").between(2, 60)))
    hits = (grams.join(F.broadcast(am),
                       grams.gram_norm == am.alias_norm, "inner")
            .select("doc_id", "span_offset", "start", "n", "geoname_id"))
    per_span = (hits.groupBy("doc_id", "span_offset")
                .agg(F.collect_set(F.struct("start", "n")).alias("occs"),
                     F.collect_list(
                         F.struct("start", "n", "geoname_id")).alias("cands")))
    timed("per_span_groupby", lambda: noop(per_span))
    timed("detect_full", lambda: noop(mentions.detect_mentions(docs, places)))
    timed("link_full",
          lambda: noop(linking.link_mentions(docs, places,
                                             n_docs=docs.count())))
    spark.stop()


def main() -> None:
    for name, conf in VARIANTS.items():
        run_variant(name, conf)


if __name__ == "__main__":
    main()
