"""Training-sequence packing: concatenate documents in doc_id order and
chunk the token stream into fixed-budget context windows — the standard
GPT-style pre-training layout (concat-with-separators, slice into
context-length sequences). Each document is assigned the sequence id and
intra-sequence offset at which its tokens begin; documents may straddle
a boundary (straddle-allowed packing), which keeps the assignment a pure
prefix-sum and therefore deterministic and embarrassingly scalable.

The interesting part at 100 TB is the PREFIX SUM. The naive Spark
spelling — ``sum().over(Window.orderBy("doc_id"))`` with no partition
spec — collapses the whole corpus into ONE task (Catalyst plans
``Exchange SinglePartition``): correct at test scale, dead at cluster
scale. This operator implements the classic two-phase distributed scan
instead:

1. range-partition by doc_id (contiguous doc runs per partition),
   localCheckpointed so both downstream uses see the SAME partitioning
   (repartitionByRange samples boundaries; two independent
   materializations could disagree);
2. per-partition token subtotals — one tiny row per partition — are
   collected, prefix-summed on the driver, and broadcast back as base
   offsets (the only driver-side step: O(#partitions), not O(rows));
3. a window partitioned BY PARTITION ID computes the within-partition
   running sum in parallel; global offset = base[pid] + local prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.operators.textstats import tokens

DEFAULT_BUDGET = 512


def sequence_packing(documents: DataFrame,
                     budget: int = DEFAULT_BUDGET,
                     num_partitions: int | None = None) -> DataFrame:
    """(doc_id, n_tokens, seq_id, seq_offset): the training sequence and
    offset where each document's tokens begin when the corpus is
    concatenated in doc_id order and chunked into `budget`-token
    windows. seq_id = floor(prefix_tokens / budget), seq_offset =
    prefix_tokens % budget, with prefix_tokens the total tokens of all
    earlier documents."""
    tok = documents.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens"))
    if num_partitions:
        part = tok.repartitionByRange(num_partitions, F.col("doc_id"))
    else:
        part = tok.repartitionByRange(F.col("doc_id"))
    # Pin ONE materialization of the sampled range boundaries: the
    # subtotal collect and the window scan below must observe identical
    # partitioning or base offsets would describe the wrong partitions.
    part = part.withColumn("pid", F.spark_partition_id()).localCheckpoint(
        eager=False)

    subtotals = (part.groupBy("pid")
                 .agg(F.sum("n_tokens").alias("t"),
                      F.min("doc_id").alias("lo"))
                 .collect())  # one row per partition — O(cluster), not O(data)
    base_rows = []
    acc = 0
    for r in sorted(subtotals, key=lambda r: r["lo"]):
        base_rows.append((r["pid"], acc))
        acc += r["t"]
    # Base offsets rejoin as a broadcast dim keyed by pid, NOT as a
    # chained CASE WHEN literal: a 10k-partition cluster run would turn
    # the expression spelling into a 10k-branch codegen tree, while the
    # broadcast hash join stays O(1) per row at any partition count.
    base_df = part.sparkSession.createDataFrame(
        base_rows, "pid int, base long")

    w = (Window.partitionBy("pid").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    prefix = (F.coalesce(F.col("base"), F.lit(0))
              + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))).cast("long")
    # integer `div`, not floor over a double quotient (round-6 ADVICE):
    # `/` on longs promotes to double, which is exact only while the
    # prefix sums stay under 2^53 and the budget is a power of two —
    # a non-power-of-two budget at very large corpora could misround
    # the quotient and diverge from the oracle's integer `//`
    return (part.join(F.broadcast(base_df), "pid", "left")
            .select("doc_id", "n_tokens",
                    prefix.alias("_p"))
            .select("doc_id", "n_tokens",
                    F.expr(f"_p div {int(budget)}").cast("long")
                    .alias("seq_id"),
                    (F.col("_p") % budget).cast("long").alias("seq_offset")))
