"""Approximate-nearest-neighbour search over the `embeddings` table
(vec_id, embedding float[], label).

- `ann_brute_topk`: exact baseline — broadcast the (small) query set,
  cosine against every vector with pure Column math (F.zip_with +
  F.aggregate, whole-stage codegen), window top-k. At scale: queries are
  always broadcastable; the corpus side stays partitioned, no shuffle
  until the final per-query top-k (tiny).
- `ann_lsh_topk`: the scale path — random-hyperplane LSH (planes from
  the persisted hyperplanes fixture so the DuckDB oracle sees identical
  buckets), equi-join on bucket signature, top-k within bucket. Recall
  is approximate by construction; the bench compares its hit rate
  against the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_brute_topk(embeddings: DataFrame, n_queries: int = 10,
                   k: int = 5) -> DataFrame:
    """Top-k cosine neighbours of the first `n_queries` vec_ids.
    Output: (query_id, neighbor_id, cos, rank)."""
    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    queries = F.broadcast(
        emb_d.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"),
                F.col("emb").alias("q_emb")))
    pairs = (queries.join(emb_d.withColumnRenamed("vec_id", "neighbor_id"),
                          F.col("query_id") != F.col("neighbor_id"))
             .withColumn("cos", F.round(cosine(F.col("q_emb"),
                                               F.col("emb")), 6)))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cos").desc(), F.col("neighbor_id").asc()))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


def lsh_signature(embeddings: DataFrame, hyperplanes: DataFrame) -> DataFrame:
    """(vec_id, bucket) — sign-bit string over the persisted hyperplanes.
    One broadcast join + groupBy; no data-dependent shuffle width."""
    hp = F.broadcast(hyperplanes.select(
        "plane_id", F.col("weights").alias("plane")))
    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    signs = (emb_d.crossJoin(hp)
             .withColumn("bit", F.when(dot(F.col("emb"),
                                           F.col("plane")) >= 0, "1")
                         .otherwise("0")))
    return (signs.groupBy("vec_id")
            .agg(F.concat_ws(
                "", F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("plane_id", "bit"))),
                    lambda s: s["bit"])).alias("bucket")))


def ann_lsh_topk(embeddings: DataFrame, hyperplanes: DataFrame,
                 n_queries: int = 10, k: int = 5) -> DataFrame:
    """Bucketed ANN: exact cosine only within the query's LSH bucket."""
    sig = lsh_signature(embeddings, hyperplanes)
    emb_d = (embeddings
             .select("vec_id",
                     F.col("embedding").cast("array<double>").alias("emb"))
             .join(sig, "vec_id"))
    queries = (emb_d.where(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("emb").alias("q_emb"), "bucket"))
    pairs = (queries.join(emb_d.withColumnRenamed("vec_id", "neighbor_id"),
                          "bucket")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("cos", F.round(cosine(F.col("q_emb"),
                                               F.col("emb")), 6)))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cos").desc(), F.col("neighbor_id").asc()))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))
