"""G3 — identity canonicalization: connected components over sameAs edges.

The reference never computes transitive identity — SAME_AS links stay
pairwise (load_indian_affairs_agents.py:135-141 and the linkers). The
north star requires real canonicalization: components of the sameAs
graph, canonical id = min(component), triples rewritten onto canonical
ids.

Spark shape: iterative min-label propagation expressed as DataFrame
self-joins with localCheckpoint() per round to cut lineage (the
documented convergence pattern for DataFrame-only connected components;
equivalent to the small-star step of Kiveris et al.'s "Connected
Components in MapReduce and Beyond", applied symmetrically). Components
produced by entity linking are tiny (stars/chains of 2-4 nodes), so
convergence is 2-4 rounds; the checkpoint bounds plan growth at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Lazy per-round checkpoints by default: the convergence check's
# count() (or the next round's join) materializes each round's labels
# as part of a job that runs anyway, instead of eager=True's dedicated
# materialization job per round. Interleaved 3x(1 cold + 4 warm) A/B on
# kg_same_as_components sf0.1 (BENCH.md): warm median 4.01 -> 3.08 s
# (-23%), lazy faster in every paired rep, identical output. Pure
# job-count savings — the win grows when per-job scheduler latency is
# elevated (this host swings it 2-3x across sessions). Knob kept for
# re-measurement.
_CC_EAGER = os.environ.get("SPARK_GRAFT_CC_EAGER", "0") == "1"

# stats of the most recent connected_components run in this process:
# {"rounds_run": int, "converged": bool}. The pipeline copies them into
# the stage _metrics table — max_iter must never truncate SILENTLY
# (round-4 VERDICT item 6: "no silent caps" applies to iteration caps
# too, now that duplicate_groups feeds CC less-bounded-diameter graphs).
LAST_CC_STATS: dict = {}


def connected_components(edges: DataFrame, src: str = "subj",
                         dst: str = "obj", max_iter: int = 25,
                         strict: bool = True) -> DataFrame:
    """(node, component) with component = lexicographic min node id
    reachable in the undirected graph.

    Min-label propagation converges in O(diameter) rounds — fine for
    linking components (stars/chains, 2-4 rounds). For deeper graphs
    (duplicate_groups template-cluster chains) a pointer-jumping step
    (labels re-mapped through their component's OWN label, the
    path-halving idea) kicks in after round 3, making convergence
    O(log diameter) without taxing the common shallow case. If the
    graph still hasn't converged at max_iter, raise (strict=True) —
    never silently return partial components; strict=False records
    converged=False in LAST_CC_STATS instead for callers that audit."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .where(F.col("a") != F.col("b"))
           .distinct()
           .localCheckpoint(eager=_CC_EAGER))

    labels = (sym.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=_CC_EAGER))

    converged = False
    rounds_run = 0
    for it in range(max_iter):
        # component candidates arriving over edges
        msgs = (sym.join(labels, sym.a == labels.node)
                .select(F.col("b").alias("node"),
                        F.col("component")))
        new_labels = (labels.select("node", "component").unionByName(msgs)
                      .groupBy("node")
                      .agg(F.min("component").alias("component")))
        if it >= 3:
            # pointer jumping: follow the label one extra hop (component
            # is itself a node, so it has a label). Each round then
            # roughly doubles propagation distance — a diameter-d chain
            # finishes in ~3 + log2(d) rounds instead of d.
            comp = new_labels.select(F.col("node").alias("c_node"),
                                     F.col("component").alias("c_comp"))
            new_labels = (new_labels
                          .join(comp,
                                new_labels.component == comp.c_node, "left")
                          .select("node",
                                  F.coalesce("c_comp", "component")
                                  .alias("component")))
        new_labels = new_labels.localCheckpoint(eager=_CC_EAGER)
        old = labels
        labels = new_labels
        rounds_run = it + 1
        # entity-linking components are stars/short chains: round 1 always
        # changes labels, so skip that convergence action (each check is a
        # full extra job — pure serial latency)
        if it == 0:
            continue
        prev = old.select("node", F.col("component").alias("old_component"))
        changed = (new_labels.join(prev, "node")
                   .where(F.col("component") != F.col("old_component"))
                   .limit(1).count())
        if changed == 0:
            converged = True
            break
    LAST_CC_STATS.clear()
    LAST_CC_STATS.update({"rounds_run": rounds_run, "converged": converged})
    if strict and not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds the iteration budget); raise "
            "max_iter or pass strict=False to audit via LAST_CC_STATS")
    return labels


def canonical_mapping(same_as: DataFrame) -> DataFrame:
    """(node, canonical) for every node touched by a sameAs edge."""
    return (connected_components(same_as)
            .select("node", F.col("component").alias("canonical")))


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj onto canonical ids; drop self-loops created by the
    rewrite; keep the best evidence per (subj, pred, obj)."""
    m_subj = mapping.select(F.col("node").alias("subj"),
                            F.col("canonical").alias("subj_canon"))
    m_obj = mapping.select(F.col("node").alias("obj"),
                           F.col("canonical").alias("obj_canon"))
    out = (triples
           .join(m_subj, "subj", "left")
           .join(m_obj, "obj", "left")
           .select(F.coalesce("subj_canon", "subj").alias("subj"),
                   "pred",
                   F.coalesce("obj_canon", "obj").alias("obj"),
                   "confidence", "evidence"))
    out = out.where((F.col("pred") == "sameAs") | (F.col("subj") != F.col("obj")))
    return (out.groupBy("subj", "pred", "obj")
            .agg(F.max("confidence").alias("confidence"),
                 F.min("evidence").alias("evidence")))
