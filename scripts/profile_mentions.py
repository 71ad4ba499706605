"""Round-6 stage-level profile of the mention detection/linking cascade.

Times each sub-stage of detect_mentions / link_mentions in isolation with
the noop sink (guide §1.4), labels jobs (§1.5), and dumps
.explain("formatted") for the full queries. Does NOT touch bench.py.

Usage: python scripts/profile_mentions.py [stage ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from geo_linked_open_data_kg_spark.session import get_spark  # noqa: E402
from geo_linked_open_data_kg_spark.sources.registry import load  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(sys.argv[1:])
    spark = get_spark("profile_mentions", cores=cpus,
                      shuffle_partitions=cpus * 8)
    spark.sparkContext.setLogLevel("ERROR")

    from geo_linked_open_data_kg_spark.operators import linking, mentions

    docs = load(spark, sf_dir, "geo_documents")
    places = load(spark, sf_dir, "places")

    def timed(name, fn, shots=2):
        if only and name not in only:
            return
        per = []
        for _ in range(shots):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            per.append(round(time.time() - t0, 2))
            spark.catalog.clearCache()
        print(f"{name:42s} {per}", flush=True)

    # ---- detect_mentions decomposition -------------------------------
    spans = mentions.text_spans(docs)
    timed("spans_scan", lambda: noop(spans))

    am = mentions.alias_map(places)
    timed("alias_map", lambda: noop(am))

    ft = mentions.alias_first_tokens(am)
    timed("alias_first_tokens", lambda: noop(ft))

    grams = mentions.pruned_ngram_candidates(spans, ft)
    timed("pruned_grams", lambda: noop(grams))

    grams_f = grams.where(F.length("gram_norm").between(2, 60))
    hits = (grams_f.join(F.broadcast(am),
                         grams_f.gram_norm == am.alias_norm, "inner")
            .select("doc_id", "span_offset", "start", "n", "geoname_id"))
    timed("hits_join", lambda: noop(hits))

    per_span = (hits.groupBy("doc_id", "span_offset")
                .agg(F.collect_set(F.struct("start", "n")).alias("occs"),
                     F.collect_list(
                         F.struct("start", "n", "geoname_id")).alias("cands")))
    timed("per_span_groupby", lambda: noop(per_span))

    timed("detect_full",
          lambda: noop(mentions.detect_mentions(docs, places)))

    # ---- link_mentions decomposition ---------------------------------
    timed("scored_exact",
          lambda: noop(linking.scored_exact_candidates(docs, places)))

    cgrams = mentions.capitalized_ngram_candidates(spans)
    timed("capitalized_grams", lambda: noop(cgrams))

    timed("surface_stats",
          lambda: noop(linking.surface_stats(cgrams)))

    timed("link_full",
          lambda: noop(linking.link_mentions(docs, places,
                                             n_docs=docs.count())))

    spark.stop()


if __name__ == "__main__":
    main()
