"""Stage 1 — mention detection over the interleaved text+media corpus.

Input (per BASELINE.json input_hint): documents
(doc_id string, spans array<struct<kind,text,media_ref,offset>>).

Spark shape (no per-row Python anywhere):
  posexplode spans -> keep kind='text' -> tokenize (split) -> n-gram
  candidates (1..4 tokens, pure Column via transform/sequence/slice) ->
  equi-join normalized n-gram against the gazetteer alias map
  (name + ascii_name + alternate_names exploded; broadcastable) ->
  longest-match overlap resolution (left_anti containment self-join).

Media spans are never touched: the stage reads text spans only and the
document table passes through unchanged (span-sequence invariant,
tests/test_span_invariant.py).

Reference: the planned Document/EntityMention layer
(docs/planning/HISTORICAL_KG_PIPELINE.md:89-96,139-161) and the alias
lookup in scripts/utilities/reconcile.py:26-66 (J7) — there a per-mention
Cypher query; here one set-based join for the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_NGRAM = 4


def alias_map(places: DataFrame, with_population: bool = False,
              dedup: bool = True) -> DataFrame:
    """(alias_norm, geoname_id[, population]) — exploded, deduped. The
    broadcast alias hash map of the north star. `dedup=False` skips the
    distinct (and its exchange) for consumers that tolerate duplicate
    keys, e.g. semi/anti-join dims."""
    extra = ["population"] if with_population else []
    aliases = places.select(
        "geoname_id", *extra,
        F.explode(
            F.array_union(
                F.array(F.col("name"), F.col("ascii_name")),
                F.coalesce(F.col("alternate_names"),
                           F.array().cast("array<string>")),
            )).alias("alias"))
    out = (aliases
           .where(F.col("alias").isNotNull() & (F.trim(F.col("alias")) != ""))
           .select(F.lower(F.trim(F.col("alias"))).alias("alias_norm"),
                   "geoname_id", *extra))
    return out.distinct() if dedup else out


def text_spans(documents: DataFrame) -> DataFrame:
    """Explode to one row per text span: (doc_id, span_offset, text, tokens)."""
    s = (documents
         .select("doc_id", F.explode("spans").alias("s"))
         .where(F.col("s.kind") == "text")
         .select("doc_id",
                 F.col("s.offset").alias("span_offset"),
                 F.col("s.text").alias("text")))
    return s.withColumn("tokens", F.split(F.col("text"), " +"))


def ngram_candidates(spans: DataFrame, max_n: int = MAX_NGRAM) -> DataFrame:
    """All n-grams (n=1..max_n) with 0-based token start positions.

    Single pass: one flattened higher-order expression per span, one
    explode — the corpus is scanned once, not once per n (the explode is
    the dominant cost of detection at scale).
    """
    size = F.size("tokens")

    def make(n: int):
        grams_n = F.transform(
            F.sequence(F.lit(0), F.greatest(size - n, F.lit(0))),
            lambda i: F.struct(
                i.alias("start"), F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(F.col("tokens"), i + 1, n))
                .alias("gram")))
        # sequence(0, 0) emits one bogus window when size < n — drop it
        return F.filter(grams_n, lambda s: s["start"] + n <= size)

    allgrams = F.flatten(F.array(*[make(n) for n in range(1, max_n + 1)]))
    return (spans
            .select("doc_id", "span_offset",
                    F.explode(allgrams).alias("ng"))
            .select("doc_id", "span_offset",
                    F.col("ng.start").alias("start"),
                    F.col("ng.n").alias("n"),
                    F.col("ng.gram").alias("gram"))
            .withColumn("gram_norm", F.lower(F.col("gram"))))


def alias_first_tokens(am: DataFrame) -> DataFrame:
    """Distinct first tokens of the alias vocabulary — the pruning dim
    for pruned_ngram_candidates. Vocabulary-sized, always broadcastable."""
    return (am.select(F.element_at(F.split("alias_norm", " +"), 1)
                      .alias("ft"))
            .where(F.col("ft") != "").distinct())


def position_ngram_candidates(pos: DataFrame,
                              max_n: int = MAX_NGRAM) -> DataFrame:
    """Grams built only at the start positions in `pos`
    (doc_id, span_offset, tokens, start) — shared tail of the pruned
    gram generators below."""
    size = F.size("tokens")

    def make(n: int):
        return F.when(
            F.col("start") + n <= size,
            F.struct(F.col("start").cast("int").alias("start"),
                     F.lit(n).alias("n"),
                     F.concat_ws(" ", F.slice(F.col("tokens"),
                                              F.col("start") + 1, n))
                     .alias("gram")))

    arr = F.array_compact(F.array(*[make(n) for n in range(1, max_n + 1)]))
    return (pos
            .select("doc_id", "span_offset", F.explode(arr).alias("ng"))
            .select("doc_id", "span_offset",
                    F.col("ng.start").alias("start"),
                    F.col("ng.n").alias("n"),
                    F.col("ng.gram").alias("gram"))
            .withColumn("gram_norm", F.lower(F.col("gram"))))


def pruned_ngram_candidates(spans: DataFrame, first_tokens: DataFrame,
                            max_n: int = MAX_NGRAM) -> DataFrame:
    """N-grams generated ONLY at token positions whose lowercased token
    is the first token of some gazetteer alias.

    Lossless for the exact alias equi-join: gram_norm == alias_norm
    implies equal first tokens, so a gram starting with a non-alias
    token can never hit. Most corpus tokens are function words / numbers
    that start no alias, so this skips constructing (and exploding, and
    hash-probing) the dominant share of gram strings — the #1 cost of
    detection at scale. The pruning join is a broadcast LEFT SEMI
    against a vocabulary-sized dim: no shuffle.
    """
    pos = (spans
           .select("doc_id", "span_offset", "tokens",
                   F.posexplode("tokens").alias("start", "tok"))
           .withColumn("ft", F.lower(F.col("tok")))
           .join(F.broadcast(first_tokens), "ft", "left_semi"))
    return position_ngram_candidates(pos, max_n)


def capitalized_ngram_candidates(spans: DataFrame,
                                 max_n: int = MAX_NGRAM) -> DataFrame:
    """N-grams generated ONLY at capitalized token positions
    (`^[A-Z][a-z]`) — lossless for the fuzzy-fallback path, which
    filters grams to exactly that shape: a gram is capitalized iff its
    first token is. Pure filter before construction, no join."""
    pos = (spans
           .select("doc_id", "span_offset", "tokens",
                   F.posexplode("tokens").alias("start", "tok"))
           .where(F.col("tok").rlike("^[A-Z][a-z]")))
    return position_ngram_candidates(pos, max_n)


def detect_mentions(documents: DataFrame, places: DataFrame,
                    broadcast_aliases: bool = True,
                    grams: DataFrame | None = None,
                    cap: int | None = None) -> DataFrame:
    """Exact/alias mention candidates with longest-match overlap resolution.

    Returns (doc_id, span_offset, start, n, mention_text, geoname_id).
    A mention occurrence keeps ALL candidate gids sharing its surface
    (disambiguation is stage 2's job) unless `cap` is set, which bounds
    candidates per occurrence to the top `cap` by (population DESC,
    geoname_id ASC) — the reference's LIMIT 20 (reconcile.py:61-63).

    The whole operator is ONE shuffle: a broadcast alias join, then a
    span-local groupBy where containment resolution runs as higher-order
    array expressions (no self-joins). Only (start, n, geoname_id) is
    shuffled per hit — the surface string (the widest hit column) is
    rebuilt from the span's tokens after the groupBy, and the candidate
    cap is applied on the vocabulary-sized alias map (per-alias fan-out ==
    per-occurrence candidate set), not the corpus-sized hit stream.
    """
    am = alias_map(places, with_population=cap is not None)
    if grams is None:
        grams = pruned_ngram_candidates(text_spans(documents),
                                        alias_first_tokens(am))
    # alias lengths bound the useful gram universe — prune before the join
    grams = grams.where(F.length("gram_norm").between(2, 60))
    if cap is not None:
        from pyspark.sql import Window
        w = (Window.partitionBy("alias_norm")
             .orderBy(F.col("population").desc_nulls_last(),
                      F.col("geoname_id").asc()))
        am = (am.withColumn("cr", F.row_number().over(w))
              .where(F.col("cr") <= cap).drop("cr", "population"))
    if broadcast_aliases:
        am = F.broadcast(am)
    cand_cols = ["start", "n", "geoname_id"]
    hits = (grams.join(am, grams.gram_norm == am.alias_norm, "inner")
            .select("doc_id", "span_offset", *cand_cols))

    per_span = (hits.groupBy("doc_id", "span_offset")
                .agg(F.collect_set(F.struct("start", "n")).alias("occs"),
                     F.collect_list(F.struct(*cand_cols)).alias("cands")))
    spans = text_spans(documents).select("doc_id", "span_offset", "tokens")
    kept = F.filter(
        F.col("cands"),
        lambda c: ~F.exists(
            F.col("occs"),
            lambda o: (o["start"] <= c["start"])
            & (o["start"] + o["n"] >= c["start"] + c["n"])
            & (o["n"] > c["n"])))
    return (per_span.join(spans, ["doc_id", "span_offset"])
            .select("doc_id", "span_offset", "tokens",
                    F.explode(kept).alias("m"))
            .select("doc_id", "span_offset",
                    F.col("m.start").alias("start"),
                    F.col("m.n").alias("n"),
                    F.concat_ws(" ", F.slice(F.col("tokens"),
                                             F.col("m.start") + 1,
                                             F.col("m.n")))
                    .alias("mention_text"),
                    F.col("m.geoname_id").alias("geoname_id")))
