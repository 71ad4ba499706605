"""Deterministic domain-mixture sampling for training-data curation.

Pre-training pipelines re-weight heterogeneous sources (web / code /
books / reference) to a target mixture (the published Pile / Gopher /
Dolma recipe tables). At 100 TB the only sane spelling is HASH-THRESHOLD
sampling: keep a row iff a salted content hash falls below the source's
cutoff. That is

- exactly reproducible (same seed -> same sample, on any cluster, any
  partitioning, any execution order — unlike `df.sample`/`sampleBy`,
  whose per-partition RNG changes with the split layout),
- one map-side pass: the per-source cutoffs broadcast, the filter is
  pure Column work inside whole-stage codegen, ZERO shuffles, and
- exact to replicate in any engine (the cutoff compare is a
  fixed-length lowercase-hex string compare — no float boundary).

The cutoff for fraction f is the 8-hex-digit prefix floor(f * 16^8);
f >= 1.0 becomes the sentinel "g", which every hex digit sorts below,
so keep-all costs no special case in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_HEX_DIGITS = 8


def cutoff_hex(fraction: float) -> str:
    """Fraction in [0,1] -> the md5-prefix keep cutoff (see module doc)."""
    if fraction >= 1.0:
        return "g"
    return format(max(int(fraction * 16 ** HASH_HEX_DIGITS), 0),
                  f"0{HASH_HEX_DIGITS}x")


def mixture_hash(seed: str) -> F.Column:
    """The salted per-row bucket: first 8 hex chars of
    md5(seed:source:doc_id) — identical string in Spark and DuckDB."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), F.col("source"),
                          F.col("doc_id").cast("string"))),
        1, HASH_HEX_DIGITS)


def domain_mixture(documents: DataFrame, weights: dict[str, float],
                   seed: str = "mix-v1",
                   default_fraction: float = 1.0) -> DataFrame:
    """Sample each source down to its target fraction, deterministically.

    `weights` maps source -> keep fraction; sources absent from the map
    keep `default_fraction`. The tiny cutoff table broadcasts; the
    filter is map-side.
    Output: kept rows only, (doc_id, source, bucket) with bucket the
    8-hex hash prefix (the sampling evidence — re-runs are auditable).
    """
    spark = documents.sparkSession
    cut = spark.createDataFrame(
        [(s, cutoff_hex(f)) for s, f in sorted(weights.items())],
        "source string, cutoff string")
    bucket = mixture_hash(seed)
    return (documents.select("doc_id", "source", bucket.alias("bucket"))
            .join(F.broadcast(cut), "source", "left")
            .where(F.col("bucket")
                   < F.coalesce(F.col("cutoff"),
                                F.lit(cutoff_hex(default_fraction))))
            .select("doc_id", "source", "bucket"))
