"""Deduplication operators for the training-data pipeline, over the
driver `documents` table (doc_id, text, lang, source, n_chars).

All signatures are md5-based (functions/hashing.py) so the DuckDB oracle
reproduces them exactly. Shingles are word 3-grams of the
lowercased/trimmed text.

Scale notes (the 100 TB story):
- exact: one shuffle on the 32-hex digest — trivially scalable.
- minhash-LSH: docs -> shingles is a flatMap; signatures are one groupBy
  on doc_id; band buckets are one groupBy on (band, band_key); candidate
  pairs only ever materialize within a bucket (never the n^2 cross join);
  the final verify re-joins shingle sets for exact Jaccard. Hot buckets
  (boilerplate docs) are bounded by a per-bucket size cap.
- simhash: pure map-side per doc + one groupBy on the fingerprint.
- ngram-jaccard: bounded by requiring a shared rare shingle (block on
  shingle, AQE handles skewed shingles).
- embedding near-dup: cosine over LSH buckets (similarity.py) or brute
  within manageable partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.functions.hashing import (
    md5_hex,
    md5_int,
    seeded,
)

N_MINHASH = 12
N_BANDS = 4  # 3 rows per band
SIMHASH_BITS = 16


def norm_text(c: Column) -> Column:
    return F.lower(F.trim(c))


def shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word k-grams of normalized text."""
    toks = F.split(norm_text(F.col("text")), " +")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    return (documents
            .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
            .where(F.col("shingle") != ""))


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup: md5(normalized text) groups with >1 member.
    Output: (text_hash, n_dups, keeper_doc_id)."""
    return (documents
            .withColumn("text_hash", md5_hex(norm_text(F.col("text"))))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_dups"),
                 F.min("doc_id").alias("keeper_doc_id"))
            .where(F.col("n_dups") > 1))


def minhash_signatures(documents: DataFrame,
                       n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}) — min over md5('seed:'||shingle) hex
    strings (lexicographic min == min-hash over a random permutation)."""
    sh = shingles(documents)
    aggs = [F.min(md5_hex(seeded(F.col("shingle"), s))).alias(f"mh_{s}")
            for s in range(n_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(documents: DataFrame, n_hashes: int = N_MINHASH,
                      n_bands: int = N_BANDS,
                      jaccard_threshold: float = 0.5,
                      max_bucket: int = 50) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    shingle -> minhash -> band -> bucket-join -> verify. Output:
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded 4dp.
    """
    rows = n_hashes // n_bands
    sig = minhash_signatures(documents, n_hashes)
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        bands.append(sig.select(
            "doc_id", F.lit(b).alias("band"),
            md5_hex(F.concat_ws("|", *cols)).alias("bucket")))
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)

    # cap runaway buckets (boilerplate guard) — deterministic by doc_id
    from pyspark.sql import Window
    w = Window.partitionBy("band", "bucket").orderBy("doc_id")
    banded = (banded.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= max_bucket).drop("rn"))

    a = banded.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    b = banded.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    cand = (a.join(b, ["band", "bucket"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    return verify_jaccard(cand, documents, jaccard_threshold)


def verify_jaccard(pairs: DataFrame, documents: DataFrame,
                   threshold: float) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs."""
    sh = shingles(documents)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (pairs
             .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
             .join(sh.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("shingle", "shingle_b"),
                   "doc_b")
             .where(F.col("shingle") == F.col("shingle_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("n_inter")))
    out = (inter
           .join(sizes.select(F.col("doc_id").alias("doc_a"),
                              F.col("n_sh").alias("n_a")), "doc_a")
           .join(sizes.select(F.col("doc_id").alias("doc_b"),
                              F.col("n_sh").alias("n_b")), "doc_b")
           .withColumn("jaccard",
                       F.round(F.col("n_inter").cast("double")
                               / (F.col("n_a") + F.col("n_b")
                                  - F.col("n_inter")), 4)))
    return (out.where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def ngram_jaccard_pairs(documents: DataFrame,
                        threshold: float = 0.8) -> DataFrame:
    """Blocked exact n-gram Jaccard: candidate pairs must share >=1
    shingle (the block), then exact verify. No LSH approximation."""
    sh = shingles(documents)
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    cand = (a.join(b, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    return verify_jaccard(cand, documents, threshold)


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — sign of per-bit +-1 sums over token md5 bits."""
    toks = (documents
            .select("doc_id",
                    F.explode(F.split(norm_text(F.col("text")), " +"))
                    .alias(  # noqa: E501
                        "tok"))
            .where(F.col("tok") != ""))
    h = toks.withColumn("th", md5_int(F.col("tok"), chars=(bits + 3) // 4))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("th"), i).bitwiseAND(1) == 1,
                     1).otherwise(-1)).alias(f"s_{i}")
        for i in range(bits)]
    agg = h.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"s_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_duplicate_groups(documents: DataFrame) -> DataFrame:
    """Docs sharing an identical simhash fingerprint (hamming-0 groups)."""
    return (simhash(documents)
            .groupBy("simhash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keeper_doc_id"))
            .where(F.col("n_docs") > 1))


def embedding_near_dups(embeddings: DataFrame,
                        threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force baseline; the
    LSH-bucketed scale path is similarity.ann_lsh_topk)."""
    from geo_linked_open_data_kg_spark.operators.similarity import cosine
    a = embeddings.select(F.col("vec_id").alias("id_a"),
                          F.col("embedding").alias("emb_a"))
    b = embeddings.select(F.col("vec_id").alias("id_b"),
                          F.col("embedding").alias("emb_b"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos", F.round(cosine(F.col("emb_a"),
                                              F.col("emb_b")), 4))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))
