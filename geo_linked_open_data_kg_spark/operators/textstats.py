"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting. All pure
Column expressions (JVM-side, codegen) over the driver `documents`
table; each has a DuckDB-oracle twin in queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.functions.hashing import md5_hex

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "was", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "in", "von", "zu", "mit", "ist", "ein"],
    "fr": ["le", "la", "de", "et", "un", "une", "dans", "est", "pour", "que"],
}

# BPE-ish subword segmentation: word pieces of letters, digits runs,
# or single punctuation — a regex stand-in for a real tokenizer's
# pre-tokenization rule (GPT-2 style).
BPE_ISH = r"[A-Za-z]{1,4}|\d{1,3}|[^\sA-Za-z\d]"


def tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(c)), " +"), lambda x: x != "")


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_ish_tokens, n_chars_norm)."""
    t = tokens(F.col("text"))
    bpe = F.regexp_count(F.col("text"), F.lit(BPE_ISH))
    return documents.select(
        "doc_id",
        F.size(t).alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_ish_tokens"),
        F.length(F.trim(F.col("text"))).alias("n_chars_norm"))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    t = tokens(c)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return n_sw.cast("double") / F.greatest(F.size(t), F.lit(1)).cast("double")


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword heuristics -> composite quality in
    [0,1]. (doc_id, len_score, punct_ratio, stop_ratio, quality)."""
    text = F.col("text")
    n = F.length(text)
    punct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("double") \
        / F.greatest(n, F.lit(1)).cast("double")
    stop = stopword_ratio(text)
    len_score = F.least(n.cast("double") / 500.0, F.lit(1.0))
    # floor-truncate: composite weights land exactly on .xxxx5 where
    # Spark (HALF_UP on shortest decimal repr) and other engines disagree
    quality = F.floor(
        (0.4 * len_score + 0.3 * F.least(stop * 5.0, F.lit(1.0))
         + 0.3 * (1.0 - F.least(punct * 10.0, F.lit(1.0)))) * 10000) / 10000
    return documents.select(
        "doc_id", F.round(len_score, 4).alias("len_score"),
        F.round(punct, 4).alias("punct_ratio"),
        F.round(stop, 4).alias("stop_ratio"),
        quality.alias("quality"))


def language_id(documents: DataFrame) -> DataFrame:
    """n-gram/stopword-hit language ID: argmax of per-language stopword
    ratios, 'und' when nothing hits. (doc_id, pred_lang, best_ratio)."""
    t = tokens(F.col("text"))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        r = (F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
             .cast("double")
             / F.greatest(F.size(t), F.lit(1)).cast("double"))
        scores.append(F.struct(F.round(r, 6).alias("ratio"),
                               F.lit(lang).alias("lang")))
    best = F.sort_array(F.array(*scores), asc=False)[0]
    return documents.select(
        "doc_id",
        F.when(best["ratio"] > 0, best["lang"]).otherwise("und")
        .alias("pred_lang"),
        best["ratio"].alias("best_ratio"))


def fingerprints(documents: DataFrame, k: int = 3) -> DataFrame:
    """Rolling-hash document fingerprint: min md5 over word k-gram
    windows (winnowing-style min selection). (doc_id, fingerprint)."""
    t = tokens(F.col("text"))
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)))
    min_h = F.array_min(F.transform(windows, lambda w: F.md5(w)))
    return documents.select("doc_id", min_h.alias("fingerprint"))
