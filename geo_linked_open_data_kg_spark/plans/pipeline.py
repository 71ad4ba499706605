"""End-to-end KG-construction pipeline (SURVEY.md §7.1).

    documents ──[1] mention detection ──[2] entity linking ─┐
    gazetteer ──[0] ingest ──[3] triple extraction ─────────┤
                                                            ▼
    [4] canonicalization (sameAs connected components) → rewrite
    [5] materialize: nodes + edges tables (+ _metrics/_lineage)

Every stage is a pure DataFrame transform checkpointed via
CheckpointStore; a re-run resumes after the last completed stage.
Documents are repartitioned once on hash(doc_id) (the north rule's
explicit repartitioning) and media spans pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.functions.geo import cell_id, coarse_cell
from geo_linked_open_data_kg_spark.operators import (
    admin,
    biography,
    direct_link,
    linking,
    postal,
    spatial,
)
from geo_linked_open_data_kg_spark.operators.canonicalize import (
    canonical_mapping,
    rewrite_triples,
)
from geo_linked_open_data_kg_spark.plans.checkpoint import CheckpointStore
from geo_linked_open_data_kg_spark.sources.registry import load

TRIPLE_COLS = ["subj", "pred", "obj", "confidence", "evidence"]


def run_pipeline(spark: SparkSession, sf_dir: str, out_dir: str,
                 doc_partitions: int | None = None,
                 force: bool = False,
                 corpus_clustered: bool = False,
                 fuzzy_max_seen: int | None = None,
                 max_adm_level: int = 4) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns the stage outputs.

    `corpus_clustered=True` skips the initial corpus repartition for
    sources already laid out clustered by doc_id (an Iceberg table
    bucketed/sorted on doc_id, or a re-ingested checkpoint written with
    partitionBy semantics): plain parquet carries no clustering metadata
    Catalyst could trust, so the caller asserts it. At 100 TB this saves
    the single largest shuffle in the job; with the flag off, the one
    corpus exchange is shared across every downstream consumer
    (ReuseExchange + subset distribution satisfaction).
    `fuzzy_max_seen` / `max_adm_level` exist for the bench A/B only
    (round-4 VERDICT item 1): fuzzy_max_seen=1 restricts the fuzzy gate
    to the round-3 zero-exact behaviour and max_adm_level=3 drops the
    ADM4 edge family, isolating the marginal cost of the round-4
    additions. Production and oracles use the defaults."""
    ckpt = CheckpointStore(out_dir)
    # match the shuffle-partition count so the reused corpus clustering
    # carries the same parallelism as every downstream exchange
    n_part = doc_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))

    places = load(spark, sf_dir, "places")
    wd = load(spark, sf_dir, "wikidata_places")
    persons = load(spark, sf_dir, "persons")
    orgs = load(spark, sf_dir, "organizations")
    post_offices = load(spark, sf_dir, "post_offices")
    a1 = (load(spark, sf_dir, "admin1_names")
          .where(F.col("country_code") == "AA"))
    # repartition by the doc_id COLUMN (not an opaque hash(doc_id)
    # expression): Catalyst then knows the corpus is clustered by doc_id,
    # so the cascade's per-span groupBy ((doc_id, span_offset) ⊇ doc_id)
    # and the tokens-rebuild join satisfy their distribution requirements
    # WITHOUT further corpus-wide exchanges — one shuffle of the corpus
    # total, reused across DAG branches (ReuseExchange)
    raw_docs = load(spark, sf_dir, "geo_documents")
    docs = (raw_docs if corpus_clustered
            else raw_docs.repartition(n_part, F.col("doc_id")))
    fprio = load(spark, sf_dir, "feature_priority")
    wprio = load(spark, sf_dir, "wd_type_priority")

    def _linked_chain() -> tuple[DataFrame, DataFrame]:
        linked = ckpt.get_or_compute(
            spark, "linked_mentions",
            # n_docs from the raw scan (row-group stats count) — counting
            # the repartitioned df would run the corpus exchange twice
            lambda: linking.link_mentions(
                docs, places, n_docs=raw_docs.count(),
                fuzzy_max_seen=(fuzzy_max_seen if fuzzy_max_seen is not None
                                else linking.FUZZY_MAX_SEEN)),
            force=force)
        mention_t = ckpt.get_or_compute(
            spark, "mention_triples",
            lambda: linking.mention_triples(linked), force=force)
        return linked, mention_t

    def _gaz():
        # every edge family the reference loads (load_post_offices.py:146,
        # load_wikidata_entities.py:195, ENTITY_LINKING_PLAN_UPDATED.md:
        # 106-221) — all rewritten through canonicalization downstream
        fams = [
            direct_link.direct_id_links(wd, places),
            admin.admin_triples(places, max_level=max_adm_level),
            spatial.promote_near_to_same_as(
                spatial.spatial_links(wd, places, fprio, wprio)),
            biography.born_in(persons, wd),
            biography.died_in(persons, wd),
            biography.resided_in(persons, wd),
            biography.worked_at(persons, wd),
            biography.citizen_of(persons, wd),
            biography.spouse_pairs(persons),
            biography.parent_of(persons),
            biography.headquartered_in(orgs, wd),
            biography.founded_in(orgs, wd),
            postal.post_office_links(post_offices, places, a1),
        ]
        out = fams[0].select(*TRIPLE_COLS)
        for f in fams[1:]:
            out = out.unionByName(f.select(*TRIPLE_COLS))
        return out

    # The three leading stage chains are mutually independent:
    # linked_mentions(+mention_triples), gazetteer_triples, and nodes.
    # Run them as concurrent driver threads (guide §2.6: actions are
    # only sequential because the driver calls them sequentially) so the
    # scheduler backfills one chain's straggler tail with the next
    # chain's tasks. FIFO scheduling keeps the first-submitted (longest)
    # chain prioritized; resume semantics are unchanged — each stage
    # still checks its own checkpoint independently.
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_linked = pool.submit(_linked_chain)
        f_gaz = pool.submit(
            lambda: ckpt.get_or_compute(
                spark, "gazetteer_triples", _gaz, force=force))
        f_nodes = pool.submit(
            lambda: ckpt.get_or_compute(
                spark, "nodes",
                lambda: build_nodes(places, wd, persons, orgs, post_offices),
                partition_by=["label"], force=force))
        linked, mention_t = f_linked.result()
        gaz_triples = f_gaz.result()
        nodes = f_nodes.result()

    from geo_linked_open_data_kg_spark.operators import canonicalize

    # CC convergence audit (no silent iteration caps): stats are copied
    # out of canonicalize.LAST_CC_STATS IMMEDIATELY after the CC call —
    # not at metrics-write time — so a later CC invocation in the same
    # process can never masquerade as this stage's run
    cc_stats: dict = {}

    def _canon_compute() -> DataFrame:
        mapping = canonical_mapping(
            gaz_triples.where(F.col("pred") == "sameAs"))
        cc_stats.update(canonicalize.LAST_CC_STATS)
        return rewrite_triples(
            gaz_triples.unionByName(mention_t.select(*TRIPLE_COLS)),
            mapping)

    canon = ckpt.get_or_compute(
        spark, "canonical_triples", _canon_compute, force=force,
        extra_metrics_fn=lambda: [
            ("cc_rounds_run", cc_stats.get("rounds_run", -1)),
            ("cc_converged", int(cc_stats.get("converged", False)))])

    def _edges() -> DataFrame:
        # north rule: node/edge tables "partitioned by H3 cell and
        # predicate". The edge's layout cell is its SUBJECT's coarse
        # grid box (functions/geo.coarse_cell): spatial queries prune
        # to (pred, cell) partitions; person/org-subject edges (no
        # coordinate) land in cell = -1. The subj->cell dim is keyed,
        # deduped and tiny relative to the edge table (nodes vs
        # triples), so this is one equi-join Catalyst broadcasts here
        # and would shuffle-hash at cluster scale; the explicit
        # repartition on the partition spec keeps the write at one
        # file per (pred, cell) dir instead of one per task per dir.
        # cell from the subject's CANONICAL coordinate (lexicographic
        # struct-min over its rows) — the same representative the
        # serving read path refines against (operators/serving.py), so
        # layout partition and serving coordinate can never disagree
        # for an id with several coordinate rows (min over cells and
        # min over coordinates need not name the same row)
        subj_cells = (nodes
                      .where(F.col("latitude").isNotNull())
                      .groupBy(F.col("id").alias("subj"))
                      .agg(F.min(F.struct("latitude", "longitude"))
                           .alias("c"))
                      .select("subj",
                              coarse_cell(F.col("c.latitude"),
                                          F.col("c.longitude"))
                              .alias("cell")))
        return (canon.join(subj_cells, "subj", "left")
                .withColumn("cell", F.coalesce(F.col("cell"), F.lit(-1)))
                .repartition("pred", "cell")
                .select(*TRIPLE_COLS, "cell"))

    edges = ckpt.get_or_compute(
        spark, "edges", _edges, partition_by=["pred", "cell"], force=force)

    return {"linked_mentions": linked, "mention_triples": mention_t,
            "gazetteer_triples": gaz_triples, "canonical_triples": canon,
            "nodes": nodes, "edges": edges}


def build_nodes(places: DataFrame, wd: DataFrame, persons: DataFrame,
                orgs: DataFrame | None = None,
                post_offices: DataFrame | None = None) -> DataFrame:
    """Materialized node table: (id, label, name, latitude, longitude,
    country_code, cell_id) — the Neo4j labels become a partition column
    (SURVEY.md §1.1). All reference node families: Place, WikidataPlace,
    Person, Organization (load_wikidata_entities.py:195), PostOffice
    (load_post_offices.py:146)."""
    nolat = F.lit(None).cast("double")
    p = places.select(
        F.concat(F.lit("gn:"), F.col("geoname_id")).alias("id"),
        F.lit("Place").alias("label"), "name", "latitude", "longitude",
        "country_code")
    w = wd.select(
        F.col("qid").alias("id"), F.lit("WikidataPlace").alias("label"),
        "name", "latitude", "longitude",
        F.col("country_qid").alias("country_code"))
    pe = persons.select(
        F.col("qid").alias("id"), F.lit("Person").alias("label"), "name",
        nolat.alias("latitude"), nolat.alias("longitude"),
        F.col("citizenship_qid").alias("country_code"))
    out = p.unionByName(w).unionByName(pe)
    if orgs is not None:
        out = out.unionByName(orgs.select(
            F.col("qid").alias("id"), F.lit("Organization").alias("label"),
            "name", nolat.alias("latitude"), nolat.alias("longitude"),
            F.lit(None).cast("string").alias("country_code")))
    if post_offices is not None:
        out = out.unionByName(post_offices.select(
            F.concat(F.lit("po:"), F.col("id_number")).alias("id"),
            F.lit("PostOffice").alias("label"), "name",
            nolat.alias("latitude"), nolat.alias("longitude"),
            F.lit(None).cast("string").alias("country_code")))
    return out.withColumn(
        "cell_id",
        F.when(F.col("latitude").isNotNull(),
               cell_id("latitude", "longitude")))
