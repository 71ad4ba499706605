"""Run one query with the Spark UI enabled and dump per-stage metrics
from the REST API — attributes wall-clock to stages (guide §7.1 without
a browser).

Usage: python scripts/profile_stages_ui.py [detect|link|pipeline]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WHICH = sys.argv[1] if len(sys.argv) > 1 else "detect"


def main() -> None:
    extra = {}
    if os.environ.get("AB_OPENCOST"):
        extra["spark.sql.files.openCostInBytes"] = os.environ["AB_OPENCOST"]
    if os.environ.get("AB_OBJHASH"):
        extra["spark.sql.objectHashAggregate.sortBased.fallbackThreshold"] = \
            os.environ["AB_OBJHASH"]
    if os.environ.get("AB_MINPART"):
        extra["spark.sql.adaptive.coalescePartitions.minPartitionSize"] = \
            os.environ["AB_MINPART"]
    builder = (SparkSession.builder.master(f"local[{CPUS}]")
               .appName(f"stages_{WHICH}"))
    for k, v in extra.items():
        builder = builder.config(k, v)
    spark = (builder
             .config("spark.sql.shuffle.partitions", str(CPUS * 8))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.io.compression.codec", "zstd")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4047")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from geo_linked_open_data_kg_spark.operators import linking, mentions
    from geo_linked_open_data_kg_spark.sources.registry import load

    docs = load(spark, SF_DIR, "geo_documents")
    places = load(spark, SF_DIR, "places")

    runs = int(os.environ.get("AB_RUNS", "2"))
    for i in range(runs):
        t0 = time.time()
        if WHICH == "detect":
            out = mentions.detect_mentions(docs, places)
            out.write.format("noop").mode("overwrite").save()
        elif WHICH == "link":
            out = linking.link_mentions(docs, places, n_docs=docs.count())
            out.write.format("noop").mode("overwrite").save()
        print(f"WALL {WHICH} run{i}: {time.time()-t0:.2f}s", flush=True)
    if WHICH == "pipeline":
        import shutil
        import tempfile

        from geo_linked_open_data_kg_spark.plans.pipeline import run_pipeline
        t0 = time.time()
        d = tempfile.mkdtemp(prefix="kg_prof_")
        try:
            run_pipeline(spark, SF_DIR, d)["canonical_triples"].count()
        finally:
            shutil.rmtree(d, ignore_errors=True)
        print(f"WALL {WHICH}: {time.time() - t0:.2f}s", flush=True)

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4047/api/v1/applications/{app_id}/stages"
    data = json.loads(urllib.request.urlopen(url).read())
    rows = []
    for st in data:
        if st["status"] != "COMPLETE":
            continue
        dur = (st.get("executorRunTime") or 0) / 1000.0
        rows.append((dur, st["stageId"], st["numCompleteTasks"],
                     st.get("executorCpuTime", 0) / 1e9,
                     st.get("shuffleWriteBytes", 0) / 1e6,
                     st.get("shuffleReadBytes", 0) / 1e6,
                     (st.get("submissionTime"), st.get("completionTime")),
                     st["name"].split("\n")[0][:60]))
    rows.sort(reverse=True)
    print(f"{'runT(s)':>8} {'stage':>5} {'tasks':>5} {'cpuT':>8} "
          f"{'shW(MB)':>8} {'shR(MB)':>8}  name")
    for dur, sid, nt, cpu, shw, shr, times, name in rows[:25]:
        print(f"{dur:8.1f} {sid:5d} {nt:5d} {cpu:8.1f} "
              f"{shw:8.1f} {shr:8.1f}  {name}")
    # wall-clock per stage from submission/completion
    import datetime as dt

    def parse(ts):
        return dt.datetime.strptime(ts.replace("GMT", ""),
                                    "%Y-%m-%dT%H:%M:%S.%f")
    wrows = []
    for dur, sid, nt, cpu, shw, shr, (sub, comp), name in rows:
        if sub and comp:
            w = (parse(comp) - parse(sub)).total_seconds()
            wrows.append((w, sid, nt, name))
    wrows.sort(reverse=True)
    print("\nwall-clock (submission->completion):")
    for w, sid, nt, name in wrows[:25]:
        print(f"{w:8.1f} {sid:5d} {nt:5d}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
