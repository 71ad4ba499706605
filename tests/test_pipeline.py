"""End-to-end pipeline: run, resume-from-checkpoint, metrics/lineage."""

from __future__ import annotations

import shutil
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from geo_linked_open_data_kg_spark.plans.pipeline import run_pipeline  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def out_dir():
    d = tempfile.mkdtemp(prefix="kg_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_pipeline_end_to_end(spark, out_dir):
    res = run_pipeline(spark, SF_DIR, out_dir)
    canon = res["canonical_triples"]
    assert canon.count() > 0
    preds = {r["pred"] for r in canon.select("pred").distinct().collect()}
    # every materialized edge family (VERDICT r2 item 3 + FOUNDED item 4)
    assert {"sameAs", "nearTo", "partOf", "mentions", "locatedInCountry",
            "bornIn", "diedIn", "residedIn", "workedAt", "citizenOf",
            "spouseOf", "parentOf", "headquarteredIn", "foundedIn"} <= preds
    labels = {r["label"] for r in
              res["nodes"].select("label").distinct().collect()}
    assert {"Place", "WikidataPlace", "Person", "Organization",
            "PostOffice"} == labels
    # canonical rewrite: no non-sameAs self loops
    assert canon.where((F.col("pred") != "sameAs")
                       & (F.col("subj") == F.col("obj"))).count() == 0
    # edges partitioned by pred on disk
    edges = spark.read.parquet(f"{out_dir}/edges")
    assert edges.count() == canon.count()


def test_pipeline_resume_skips_completed_stages(spark, out_dir):
    import time
    t0 = time.time()
    res = run_pipeline(spark, SF_DIR, out_dir)  # all checkpoints exist
    elapsed = time.time() - t0
    assert res["canonical_triples"].count() > 0
    assert elapsed < 30, f"resume took {elapsed:.0f}s — stages re-ran"


def test_metrics_and_lineage_written(spark, out_dir):
    m = spark.read.parquet(f"{out_dir}/_metrics/canonical_triples")
    rows = {r["metric"]: r["value"] for r in m.collect()}
    assert rows["n_rows"] > 0
    assert any(k.startswith("n_triples:") for k in rows)
    lin = spark.read.parquet(f"{out_dir}/_lineage/gazetteer_triples")
    assert lin.agg(F.sum("n_rows")).collect()[0][0] == \
        spark.read.parquet(f"{out_dir}/gazetteer_triples").count()
