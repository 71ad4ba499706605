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
        """Crash recovery for merge_upsert's promote. The promote is a
        two-phase commit over the three stage subs (data, _lineage,
        _metrics): a `<stage>__commit` marker is created atomically
        AFTER all shadows are written and removed after all swaps — so a
        crash anywhere leaves either no marker (roll BACK: restore any
        half-swapped sub from `__old`, discard uncommitted shadows) or
        the marker (roll FORWARD: finish every remaining swap). Either
        way data, lineage and metrics always describe the SAME snapshot
        (round-4 ADVICE: the old per-sub swap could strand lineage and
        data on different merges)."""
        import shutil
        if os.path.exists(self._marker(stage)):
            self._promote(stage)
            return
        for sub in ("", "_lineage", "_metrics"):
            dst = os.path.join(self.root, sub, stage)
            old = dst + "__old"
            if os.path.exists(old):
                if not os.path.exists(dst):
                    os.replace(old, dst)
                else:
                    shutil.rmtree(old, ignore_errors=True)
            # a shadow without the commit marker is an uncommitted merge
            shutil.rmtree(os.path.join(self.root, sub,
                                       f"{stage}__merge_tmp"),
                          ignore_errors=True)

    def _marker(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}__commit")

    def _promote(self, stage: str) -> None:
        """Swap every written shadow sub into place, then clear the
        commit marker. Idempotent: a sub whose shadow is already gone
        was swapped before the crash and is skipped."""
        import shutil
        for sub in ("", "_lineage", "_metrics"):
            src = os.path.join(self.root, sub, f"{stage}__merge_tmp")
            dst = os.path.join(self.root, sub, stage)
            old = dst + "__old"
            if os.path.exists(src):
                shutil.rmtree(old, ignore_errors=True)
                if os.path.exists(dst):
                    os.replace(dst, old)
                os.replace(src, dst)
            shutil.rmtree(old, ignore_errors=True)
        os.remove(self._marker(stage))

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self.path(stage))

    def write(self, df: DataFrame, stage: str,
              partition_by: list[str] | None = None,
              label: str | None = None,
              extra_metrics: list[tuple[str, int]] | None = None
              ) -> DataFrame:
        """Write stage output + lineage (per-partition row counts) +
        metrics (total rows, and triple counts per pred if present).
        `label` overrides the stage name recorded IN lineage/metrics rows
        (used by merge_upsert's shadow write). `extra_metrics` appends
        caller-supplied (metric, value) rows — e.g. the CC convergence
        audit (canonicalize.LAST_CC_STATS)."""
        label = label or stage
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(stage))

        spark = df.sparkSession
        out = self.read(spark, stage)

        # ONE scan of the stage output serves lineage AND every metric
        # (round 6): the (partition, pred) count cube is tiny (partitions
        # x preds), so it is cached and both tables derive from it —
        # previously lineage, the total count and the per-pred counts
        # each re-scanned the written parquet (3-4 jobs per stage, ~18
        # extra jobs per pipeline run of pure serial latency).
        has_pred = "pred" in out.columns
        gcols = [F.spark_partition_id().alias("partition_id")]
        if has_pred:
            gcols.append(F.col("pred"))
        # coalesce(1) BEFORE persist: cached plans do not get AQE
        # partition coalescing (canChangeCachedPlanOutputPartitioning
        # defaults false), so without it the tiny cube materializes and
        # is re-read at the full shuffle-partition count — measured as
        # ~22 extra 256-task stages per pipeline run. The cube is
        # (partitions x preds) rows, so one partition holds it at any
        # corpus size.
        counts = (out.groupBy(*gcols)
                  .agg(F.count("*").alias("n_rows"))
                  .coalesce(1)
                  .persist())

        lineage = (counts.groupBy("partition_id")
                   .agg(F.sum("n_rows").alias("n_rows"))
                   .withColumn("stage", F.lit(label)))
        lineage.write.mode("overwrite").parquet(
            os.path.join(self.root, "_lineage", stage))

        metrics = counts.agg(
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("value")).select(
            F.lit(label).alias("stage"), F.lit("n_rows").alias("metric"),
            F.col("value"))
        if has_pred:
            per_pred = (counts.groupBy("pred")
                        .agg(F.sum("n_rows").alias("value"))
                        .select(F.lit(label).alias("stage"),
                                F.concat(F.lit("n_triples:"),
                                         F.col("pred")).alias("metric"),
                                F.col("value")))
            metrics = metrics.unionByName(per_pred)
        if extra_metrics:
            extra = spark.createDataFrame(
                [(label, m, int(v)) for m, v in extra_metrics],
                "stage string, metric string, value long")
            metrics = metrics.unionByName(extra)
        metrics.write.mode("overwrite").parquet(
            os.path.join(self.root, "_metrics", stage))
        counts.unpersist()
        return out

    def get_or_compute(self, spark: SparkSession, stage: str, compute,
                       partition_by: list[str] | None = None,
                       force: bool = False,
                       extra_metrics_fn=None) -> DataFrame:
        """`extra_metrics_fn` (no-arg -> [(metric, value), ...]) is
        invoked AFTER compute() so it can report stats of the
        computation itself (e.g. CC rounds); skipped on checkpoint
        reuse, when nothing was computed."""
        if not force and self.exists(stage):
            return self.read(spark, stage)
        df = compute()
        extra = extra_metrics_fn() if extra_metrics_fn is not None else None
        return self.write(df, stage, partition_by, extra_metrics=extra)

    def merge_upsert(self, df: DataFrame, stage: str, keys: list[str],
                     partition_by: list[str] | None = None) -> DataFrame:
        """Keyed MERGE-INTO semantics for incremental re-runs (SURVEY
        §1.1 K1: the reference leans on Neo4j MERGE upserts; the
        production target is Iceberg MERGE INTO): every existing row
        whose key appears in `df` is replaced by the new rows for that
        key, unmatched existing rows are kept, new keys are inserted.

        Because the merge plan READS the stage it replaces, the result
        is written to a shadow directory first and swapped in via a
        marker-fenced two-phase promote: all three shadow subs (data,
        _lineage, _metrics) are written, a `<stage>__commit` marker is
        created (the commit point), every sub is swapped
        (current -> __old, shadow -> current), the marker is removed.
        _recover() on the next exists() call rolls an interrupted
        promote FORWARD past the marker and BACK before it, so the
        three subs can never straddle two merges. Local-FS os.replace
        is used because CheckpointStore's stage protocol is path-based
        local parquet by design (module docstring: the production
        target is Iceberg MERGE INTO, where the snapshot commit
        replaces this dance entirely)."""
        spark = df.sparkSession
        if self.exists(stage):
            changed = df.select(*keys).distinct()
            merged = (self.read(spark, stage)
                      .join(changed, keys, "left_anti")
                      .unionByName(df)
                      # the using-join moves the key columns first; pin
                      # the incoming schema order so the durable table's
                      # column order never drifts across merges
                      .select(*df.columns))
        else:
            merged = df
        shadow = f"{stage}__merge_tmp"
        self.write(merged, shadow, partition_by, label=stage)
        with open(self._marker(stage), "w") as fh:
            fh.write("promote\n")
        self._promote(stage)
        return self.read(spark, stage)
