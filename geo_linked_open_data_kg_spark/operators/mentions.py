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


def alias_map(places: DataFrame, with_population: bool = False) -> DataFrame:
    """(alias_norm, geoname_id[, population]) — exploded, deduped. The
    broadcast alias hash map of the north star."""
    extra = ["population"] if with_population else []
    aliases = places.select(
        "geoname_id", *extra,
        F.explode(
            F.array_union(
                F.array(F.col("name"), F.col("ascii_name")),
                F.coalesce(F.col("alternate_names"),
                           F.array().cast("array<string>")),
            )).alias("alias"))
    return (aliases
            .where(F.col("alias").isNotNull() & (F.trim(F.col("alias")) != ""))
            .select(F.lower(F.trim(F.col("alias"))).alias("alias_norm"),
                    "geoname_id", *extra)
            .distinct())


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
    span-local groupBy where containment resolution AND the candidate cap
    run as higher-order array expressions (no self-joins, no window).
    """
    if grams is None:
        grams = ngram_candidates(text_spans(documents))
    # alias lengths bound the useful gram universe — prune before the join
    grams = grams.where(F.length("gram_norm").between(2, 60))
    am = alias_map(places, with_population=cap is not None)
    if broadcast_aliases:
        am = F.broadcast(am)
    cand_cols = ["start", "n", "gram", "geoname_id"] + (
        ["population"] if cap is not None else [])
    hits = (grams.join(am, grams.gram_norm == am.alias_norm, "inner")
            .select("doc_id", "span_offset", *cand_cols))

    per_span = (hits.groupBy("doc_id", "span_offset")
                .agg(F.collect_set(F.struct("start", "n")).alias("occs"),
                     F.collect_list(F.struct(*cand_cols)).alias("cands")))
    kept = F.filter(
        F.col("cands"),
        lambda c: ~F.exists(
            F.col("occs"),
            lambda o: (o["start"] <= c["start"])
            & (o["start"] + o["n"] >= c["start"] + c["n"])
            & (o["n"] > c["n"])))
    out = (per_span
           .select("doc_id", "span_offset", F.explode(kept).alias("m"))
           .select("doc_id", "span_offset",
                   F.col("m.start").alias("start"),
                   F.col("m.n").alias("n"),
                   F.col("m.gram").alias("mention_text"),
                   F.col("m.geoname_id").alias("geoname_id"),
                   *([F.col("m.population").alias("population")]
                     if cap is not None else [])))
    if cap is not None:
        # nested-lambda ranking re-evaluates the containment expression per
        # element (cubic); a window over the exploded rows is cheaper
        from pyspark.sql import Window
        w = (Window.partitionBy("doc_id", "span_offset", "start", "n")
             .orderBy(F.col("population").desc_nulls_last(),
                      F.col("geoname_id").asc()))
        out = (out.withColumn("cr", F.row_number().over(w))
               .where(F.col("cr") <= cap).drop("cr", "population"))
    return out


def mention_contexts(documents: DataFrame, places: DataFrame,
                     mentions: DataFrame) -> DataFrame:
    """Attach disambiguation context to each mention occurrence (J9/J10).

    - admin context: pattern ``<mention> , <Admin1Occurrence>`` — an
      occurrence right after a comma whose candidate set contains an ADM1
      place is context for the preceding mention, not a mention itself
      (reconcile.py:158-195).
    - coordinate context: pattern ``<mention> at <lat> <lon>``
      (reconcile.py:113-156).

    Returns one row per mention OCCURRENCE:
    (doc_id, span_offset, start, n, mention_text, ctx_admin1_code,
    ctx_country_code, ctx_lat, ctx_lon), with admin-context token runs
    removed from the occurrence set.
    """
    spans = text_spans(documents)
    occ = (mentions.select("doc_id", "span_offset", "start", "n",
                           "mention_text").distinct())
    occ_t = occ.join(spans.select("doc_id", "span_offset", "tokens"),
                     ["doc_id", "span_offset"])

    # occurrences whose candidate set contains an ADM1 place
    adm1 = places.where(F.col("feature_code") == "ADM1").select(
        "geoname_id", F.col("admin1_code").alias("ctx_admin1_code"),
        F.col("country_code").alias("ctx_country_code"))
    # rename keys up front: admin_occ shares lineage with occ_t (both derive
    # from `mentions`), so unaliased join keys resolve ambiguously
    admin_occ = (mentions.join(adm1, "geoname_id")
                 .select(F.col("doc_id").alias("a_doc"),
                         F.col("span_offset").alias("a_off"),
                         F.col("start").alias("a_start"),
                         "ctx_admin1_code", "ctx_country_code"))

    end = F.col("start") + F.col("n")  # 0-based index just past the mention
    after1 = F.element_at(F.col("tokens"), end + 1)
    after2 = F.element_at(F.col("tokens"), end + 2)
    after3 = F.element_at(F.col("tokens"), end + 3)
    with_coord = (occ_t
                  .withColumn("ctx_lat", F.when(after1 == "at",
                                                after2.try_cast("double")))
                  .withColumn("ctx_lon", F.when(after1 == "at",
                                                after3.try_cast("double")))
                  .withColumn("comma_follows", after1 == ","))

    # mention , ADM1-occurrence → admin context for the mention
    with_admin = (with_coord
                  .join(admin_occ,
                        (F.col("doc_id") == F.col("a_doc"))
                        & (F.col("span_offset") == F.col("a_off"))
                        & F.col("comma_follows")
                        & (F.col("a_start")
                           == F.col("start") + F.col("n") + 1),
                        "left")
                  .drop("a_doc", "a_off", "a_start", "comma_follows"))

    # drop occurrences that ARE an admin context of another mention
    m2 = occ.select(F.col("doc_id").alias("d2"),
                    F.col("span_offset").alias("o2"),
                    (F.col("start") + F.col("n")).alias("m_end"))
    ctx_occ = (occ_t.join(
        m2,
        (F.col("doc_id") == F.col("d2")) & (F.col("span_offset") == F.col("o2"))
        & (F.col("start") == F.col("m_end") + 1)
        & (F.element_at(F.col("tokens"), F.col("m_end") + 1) == ","),
        "left_semi").join(
            mentions.join(adm1, "geoname_id")
            .select("doc_id", "span_offset", "start", "n"),
            ["doc_id", "span_offset", "start", "n"], "left_semi"))
    out = with_admin.join(
        ctx_occ.select("doc_id", "span_offset", "start", "n"),
        ["doc_id", "span_offset", "start", "n"], "left_anti")
    # a mention may match several ADM1 candidates with the same name;
    # keep them all — stage 2 scores (candidate, context) pairs.
    return out.select("doc_id", "span_offset", "start", "n", "mention_text",
                      "ctx_admin1_code", "ctx_country_code", "ctx_lat",
                      "ctx_lon")
