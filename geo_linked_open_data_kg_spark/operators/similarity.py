"""Approximate-nearest-neighbour search over the `embeddings` table
(vec_id, embedding float[], label).

- `ann_brute_topk`: exact baseline — broadcast the (small) query set,
  cosine against every vector with pure Column math (F.zip_with +
  F.aggregate, whole-stage codegen), window top-k. At scale: queries are
  always broadcastable; the corpus side stays partitioned, no shuffle
  until the final per-query top-k (tiny).
- `ann_lsh_topk`: the scale path — random-hyperplane LSH (planes from
  the persisted hyperplanes fixture so the DuckDB oracle sees identical
  buckets) with a multi-band OR-construction: the 16-bit signature is
  split into N_BANDS bands of ROWS_PER_BAND bits each; a pair is a
  candidate if ANY band matches, then exact cosine ranks candidates.
  One band of all 16 bits (the round-1 shape) almost never collides —
  recall ~0. (bands, rows_per_band) trades recall against candidate
  volume; the defaults (5x3) hit recall >=0.75 vs the brute baseline on
  the structure-free random test embeddings (tests assert >=0.6), with
  ~half the corpus pruned. Real corpora with cluster structure prune
  far harder at the same recall — retune per dataset, don't hardcode.
- `ann_ivf_topk` (round 4): IVF coarse-quantizer cells as the
  alternative scale path — deterministic Lloyd k-means (literal
  centroids, map-side assignment), each query probes its n_probe
  nearest cells, exact cosine within. Measured recall 0.90 at
  n_probe=4/16 vs brute on the same embeddings (tests assert >=0.7);
  at 100 TB write the corpus partitioned BY cell id and probing becomes
  partition pruning at the scan.
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


def _collect_planes(hyperplanes: DataFrame) -> list:
    """Collect the tiny plane dim ONCE per DataFrame instance (cache
    rides the instance itself, so it can never outlive it): the
    signature builders are invoked repeatedly (banded_signature,
    ann_lsh_topk, embedding_near_dups) and an eager collect inside a
    plan builder must not re-run per call (round-2 ADVICE)."""
    cached = getattr(hyperplanes, "_lsh_planes_cache", None)
    if cached is None:
        cached = sorted((r["plane_id"], list(r["weights"]))
                        for r in hyperplanes.collect())
        hyperplanes._lsh_planes_cache = cached
    return cached


def lsh_signature(embeddings: DataFrame, hyperplanes: DataFrame) -> DataFrame:
    """(vec_id, bucket) — sign-bit string over the persisted hyperplanes.

    The plane dim is tiny and fixed-size (16 x 64 doubles), so it rides
    the plan as literal arrays: the signature is PURE map-side column
    math (zero joins, zero shuffles), unlike a crossJoin+groupBy shape
    which costs one corpus shuffle per signature build. The collect is
    memoized per hyperplane-DataFrame instance."""
    planes = _collect_planes(hyperplanes)
    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    bits = [
        F.when(dot(F.col("emb"),
                   F.array(*[F.lit(float(x)) for x in w])) >= 0, "1")
        .otherwise("0")
        for _, w in planes]
    return emb_d.select("vec_id", F.concat(*bits).alias("bucket"))


N_BANDS = 5
ROWS_PER_BAND = 3


def banded_signature(embeddings: DataFrame, hyperplanes: DataFrame,
                     n_bands: int = N_BANDS,
                     rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """(vec_id, band, bucket) — the full sign-bit string sliced into
    bands (multi-band OR-construction). One explode of n_bands structs
    per vector; no data-dependent shuffle width."""
    sig = lsh_signature(embeddings, hyperplanes)
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.col("bucket").substr(b * rows_per_band + 1,
                                   F.lit(rows_per_band)).alias("bucket")))
    return (sig.select("vec_id", F.explode(bands).alias("bb"))
            .select("vec_id", F.col("bb.band").alias("band"),
                    F.col("bb.bucket").alias("bucket")))


def ann_lsh_topk(embeddings: DataFrame, hyperplanes: DataFrame,
                 n_queries: int = 10, k: int = 5,
                 n_bands: int = N_BANDS,
                 rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Multi-band bucketed ANN: a neighbour is a candidate if it shares
    ANY band bucket with the query; exact cosine ranks candidates.
    Candidate generation never materializes the n^2 cross join — only
    same-band-bucket pairs, deduped across bands."""
    sig = banded_signature(embeddings, hyperplanes, n_bands, rows_per_band)
    emb_d = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    q_sig = (sig.where(F.col("vec_id") < n_queries)
             .select(F.col("vec_id").alias("query_id"), "band", "bucket"))
    cand = (q_sig.join(sig.withColumnRenamed("vec_id", "neighbor_id"),
                       ["band", "bucket"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())
    pairs = (cand
             .join(F.broadcast(emb_d.select(
                 F.col("vec_id").alias("query_id"),
                 F.col("emb").alias("q_emb"))), "query_id")
             .join(emb_d.withColumnRenamed("vec_id", "neighbor_id"),
                   "neighbor_id")
             .withColumn("cos", F.round(cosine(F.col("q_emb"),
                                               F.col("emb")), 6)))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cos").desc(), F.col("neighbor_id").asc()))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


# ------------------------------------------------------------ IVF ANN ------
#
# Round-5 redesign (VERDICT r4 item 2): the coarse quantizer's centroids
# are PERSISTED FIXTURE DATA (fixtures.generate.write_centroids — the
# `hyperplanes` pattern), not an in-engine training run, because trained
# centroid floats depend on engine summation order and the DuckDB oracle
# must see bit-identical values. Assignment/probing use COSINE to the
# centroid (rounded 6dp, tie -> lowest cid) — the same float-discipline
# the green brute/LSH oracles already rely on — so the full IVF path is
# expressible in plain SQL over (embeddings x centroid fixture).


def _collect_cents(centroids: DataFrame) -> list:
    """Collect the tiny centroid dim ONCE per DataFrame instance (same
    memoization contract as _collect_planes)."""
    cached = getattr(centroids, "_ivf_cents_cache", None)
    if cached is None:
        cached = [list(r["weights"]) for r in
                  sorted(centroids.collect(), key=lambda r: r["cid"])]
        centroids._ivf_cents_cache = cached
    return cached


def _cent_cos_structs(emb: Column, nrm: Column, cents: list) -> Column:
    """Array of (negcos, cid) structs — one per centroid literal. Struct
    ordering then makes array_min == argmax-cosine with ties broken by
    LOWEST cid, and array_sort a best-first probe order; cosine is
    rounded 6dp first so the oracle's ORDER BY round(...) DESC, cid ASC
    sees the identical total order."""
    arr = []
    for cid, w in enumerate(cents):
        c = F.array(*[F.lit(float(x)) for x in w])
        cos = F.round(dot(emb, c) / (nrm * norm(c)), 6)
        arr.append(F.struct((-cos).alias("negcos"),
                            F.lit(cid).cast("int").alias("cid")))
    return F.array(*arr)


def _emb_with_norm(embeddings: DataFrame) -> DataFrame:
    emb = F.col("embedding").cast("array<double>")
    return embeddings.select("vec_id", emb.alias("emb"),
                             norm(emb).alias("nrm"))


def ivf_assign(embeddings: DataFrame, cents: list) -> DataFrame:
    """(vec_id, emb, nrm, cid) — the IVF inverted index. Pure map-side:
    the centroid table rides the plan as literals (centroid norms are
    literal-only subexpressions, constant-folded by Catalyst)."""
    emb_d = _emb_with_norm(embeddings)
    arr = _cent_cos_structs(F.col("emb"), F.col("nrm"), cents)
    return emb_d.withColumn("cid", F.array_min(arr)["cid"])


def ann_ivf_topk(embeddings: DataFrame,
                 centroids: DataFrame | list,
                 n_queries: int = 10, k: int = 5,
                 n_probe: int = 4) -> DataFrame:
    """IVF-partitioned ANN top-k — the cell-pruned scale path alongside
    ann_lsh_topk: the persisted coarse-quantizer cells the corpus, each
    query probes only its `n_probe` nearest cells (by centroid cosine),
    and exact cosine ranks within the probed cells. Scanned fraction is
    bounded by ~n_probe/n_centroids of the corpus per query (vs LSH's
    collision-driven pruning); at 100 TB the inverted index is the
    partitioning (write the corpus partitioned BY cid and probing
    becomes partition pruning at the scan).

    Output: (query_id, neighbor_id, cos, rank) — same shape as
    ann_brute_topk/ann_lsh_topk so recall is directly comparable."""
    cents = (_collect_cents(centroids)
             if isinstance(centroids, DataFrame) else centroids)
    assigned = ivf_assign(embeddings, cents)
    probe_arr = F.slice(
        F.array_sort(_cent_cos_structs(F.col("q_emb"), F.col("q_nrm"),
                                       cents)),
        1, n_probe)
    queries = (assigned.where(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("emb").alias("q_emb"),
                       F.col("nrm").alias("q_nrm"))
               .select("query_id", "q_emb", "q_nrm",
                       F.explode(F.transform(probe_arr, lambda s: s["cid"]))
                       .alias("cid")))
    cand = (F.broadcast(queries)
            .join(assigned.withColumnRenamed("vec_id", "neighbor_id"),
                  "cid")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cos", F.round(dot(F.col("q_emb"), F.col("emb"))
                                       / (F.col("q_nrm") * F.col("nrm")),
                                       6)))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cos").desc(), F.col("neighbor_id").asc()))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos", "rank"))


def cluster_profile(embeddings: DataFrame,
                    centroids: DataFrame | list) -> DataFrame:
    """Corpus diversity profile over the IVF quantizer's cells: per
    cluster, its member count, corpus share, and mean/min cosine to its
    own centroid (tightness). The curation-side reading: a cluster
    whose share dwarfs the rest is an over-represented mode (boilerplate,
    templated spam) — the standard embedding-space complement to the
    per-source mixture weights (operators/sampling.py), telling you WHAT
    is over-represented rather than WHERE it came from.

    Scale shape: assignment is pure map-side against centroid literals
    (ivf_assign), then ONE narrow groupBy(cid) of pre-aggregated
    partials; the 1-row corpus total rejoins via a literal-free
    crossJoin of a 1-row aggregate (the dedup_cap_metrics pattern).
    Output: (cid, n_vecs, share, avg_cos, min_cos) — share rounded 6dp.
    """
    cents = (_collect_cents(centroids)
             if isinstance(centroids, DataFrame) else centroids)
    assigned = ivf_assign(embeddings, cents)
    own = _cent_cos_structs(F.col("emb"), F.col("nrm"), cents)
    member_cos = (-F.array_min(own)["negcos"]).alias("own_cos")
    per_cell = (assigned.select("cid", member_cos)
                .groupBy("cid")
                .agg(F.count("*").alias("n_vecs"),
                     F.round(F.avg("own_cos"), 6).alias("avg_cos"),
                     F.min("own_cos").alias("min_cos")))
    total = per_cell.agg(F.sum("n_vecs").alias("n_total"))
    return (per_cell.crossJoin(total)
            .select("cid", "n_vecs",
                    F.round(F.col("n_vecs") / F.col("n_total"), 6)
                    .alias("share"),
                    "avg_cos", "min_cos")
            .orderBy("cid"))
