"""Per-stage checkpoint tables with metrics + per-partition lineage.

Replaces the reference's JSON resume-state files
(create_admin_hierarchies_robust.py:40-50,453-461) and its reliance on
MERGE idempotency: each pipeline stage writes its output once to a
checkpoint table; a re-run skips stages whose checkpoint exists
(_SUCCESS marker semantics come free with Spark's parquet committer).

Production target is Iceberg (snapshot commit per stage, MERGE INTO for
incremental re-runs); this module uses plain parquet paths so the local
harness has no catalog dependency — the stage protocol is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root

    def path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def exists(self, stage: str) -> bool:
        self._recover(stage)
        return os.path.exists(os.path.join(self.path(stage), "_SUCCESS"))

    def _recover(self, stage: str) -> None:
        """Crash recovery for merge_upsert's two-step promote: if a crash
        landed between "move current aside" and "promote shadow", the
        stage dir is missing but `<stage>__old` is intact — restore it so
        a later merge_upsert never mistakes a delta for the full table."""
        import shutil
        for sub in ("", "_lineage", "_metrics"):
            dst = os.path.join(self.root, sub, stage)
            old = dst + "__old"
            if os.path.exists(old):
                if not os.path.exists(dst):
                    os.replace(old, dst)
                else:
                    shutil.rmtree(old, ignore_errors=True)

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self.path(stage))

    def write(self, df: DataFrame, stage: str,
              partition_by: list[str] | None = None,
              label: str | None = None) -> DataFrame:
        """Write stage output + lineage (per-partition row counts) +
        metrics (total rows, and triple counts per pred if present).
        `label` overrides the stage name recorded IN lineage/metrics rows
        (used by merge_upsert's shadow write)."""
        label = label or stage
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(stage))

        spark = df.sparkSession
        out = self.read(spark, stage)

        lineage = (out.groupBy(F.spark_partition_id().alias("partition_id"))
                   .agg(F.count("*").alias("n_rows"))
                   .withColumn("stage", F.lit(label)))
        lineage.write.mode("overwrite").parquet(
            os.path.join(self.root, "_lineage", stage))

        metrics = out.agg(F.count("*").alias("value")).select(
            F.lit(label).alias("stage"), F.lit("n_rows").alias("metric"),
            F.col("value"))
        if "pred" in out.columns:
            per_pred = (out.groupBy("pred").agg(F.count("*").alias("value"))
                        .select(F.lit(label).alias("stage"),
                                F.concat(F.lit("n_triples:"),
                                         F.col("pred")).alias("metric"),
                                F.col("value")))
            metrics = metrics.unionByName(per_pred)
        metrics.write.mode("overwrite").parquet(
            os.path.join(self.root, "_metrics", stage))
        return out

    def get_or_compute(self, spark: SparkSession, stage: str, compute,
                       partition_by: list[str] | None = None,
                       force: bool = False) -> DataFrame:
        if not force and self.exists(stage):
            return self.read(spark, stage)
        return self.write(compute(), stage, partition_by)

    def merge_upsert(self, df: DataFrame, stage: str, keys: list[str],
                     partition_by: list[str] | None = None) -> DataFrame:
        """Keyed MERGE-INTO semantics for incremental re-runs (SURVEY
        §1.1 K1: the reference leans on Neo4j MERGE upserts; the
        production target is Iceberg MERGE INTO): every existing row
        whose key appears in `df` is replaced by the new rows for that
        key, unmatched existing rows are kept, new keys are inserted.

        Because the merge plan READS the stage it replaces, the result
        is written to a shadow directory first and swapped in via two
        atomic renames (current -> __old, shadow -> current); a crash
        between them is healed by _recover() on the next exists() call,
        so the merge never silently degrades to delta-only. Local-FS
        os.replace is used because CheckpointStore's stage protocol is
        path-based local parquet by design (module docstring: the
        production target is Iceberg MERGE INTO, where the snapshot
        commit replaces this dance entirely)."""
        import shutil

        spark = df.sparkSession
        if self.exists(stage):
            changed = df.select(*keys).distinct()
            merged = (self.read(spark, stage)
                      .join(changed, keys, "left_anti")
                      .unionByName(df))
        else:
            merged = df
        shadow = f"{stage}__merge_tmp"
        self.write(merged, shadow, partition_by, label=stage)
        for sub in ("", "_lineage", "_metrics"):
            src = os.path.join(self.root, sub, shadow)
            dst = os.path.join(self.root, sub, stage)
            old = dst + "__old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(dst):
                os.replace(dst, old)
            os.replace(src, dst)
            shutil.rmtree(old, ignore_errors=True)
        return self.read(spark, stage)
