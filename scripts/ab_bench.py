"""Like-for-like A/B for the round-4 bench regression (VERDICT r4 #1).

Round 4's official record regressed vs round 3 (pipeline 92.3 -> 106 s)
while shipping two semantics additions — the count-based fuzzy gate and
the ADM4 edge family — with no control to separate their marginal cost
from this host's ±30% wall noise. This script measures exactly that, in
ONE session, interleaved (a variant never benefits from running later
in a warmer JVM — every variant appears once per round, in rotating
order), three rounds:

- FULL   : round-4/5 defaults (fuzzy_max_seen=5, max_adm_level=4)
- NOADM4 : fuzzy_max_seen=5,  max_adm_level=3   (ADM4 family off)
- R3GATE : fuzzy_max_seen=1,  max_adm_level=3   (round-3 zero-exact gate)

marginal(ADM4)  = median(FULL)  - median(NOADM4)
marginal(gate)  = median(NOADM4) - median(R3GATE)
FULL - R3GATE   = the total like-for-like delta the r4 record carried.

Two CONTROL queries (kg_same_as_components, td_ann_lsh_topk — code
identical across variants, both flagged as "regressed on unchanged
code" in VERDICT r4) run every round to measure the same-session noise
floor the pipeline deltas must beat.

Run from a PINNED worktree (the subprocess imports at start; editing
operator code mid-run would make rounds inconsistent — BENCH.md r3
lesson). Appends one JSON line to stdout.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geo_linked_open_data_kg_spark.fixtures.generate import synth_dir_for  # noqa: E402
from geo_linked_open_data_kg_spark.session import get_spark  # noqa: E402

VARIANTS = {
    "FULL": dict(fuzzy_max_seen=5, max_adm_level=4),
    "NOADM4": dict(fuzzy_max_seen=5, max_adm_level=3),
    "R3GATE": dict(fuzzy_max_seen=1, max_adm_level=3),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))
    synth_dir_for(sf_dir)

    spark = get_spark("ab_bench", cores=cpus, shuffle_partitions=cpus * 8)
    spark.sparkContext.setLogLevel("ERROR")

    from geo_linked_open_data_kg_spark import queries as q
    from geo_linked_open_data_kg_spark.plans.pipeline import run_pipeline

    def release() -> None:
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(5)

    pipe: dict[str, list[float]] = {v: [] for v in VARIANTS}
    triples: dict[str, int] = {}
    controls: dict[str, list[float]] = {"kg_same_as_components": [],
                                        "td_ann_lsh_topk": []}

    # warm-up: one small-slice run so codegen/JIT cost is not charged to
    # whichever variant runs first (BENCH.md round-2: warm-up 25-40s)
    wd = tempfile.mkdtemp(prefix="ab_warm_")
    try:
        run_pipeline(spark, os.environ.get(
            "SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001"), wd)[
            "canonical_triples"].count()
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    release()

    order = list(VARIANTS)
    for rnd in range(rounds):
        # rotate the within-round order so no variant always runs first
        for v in order[rnd % len(order):] + order[:rnd % len(order)]:
            out_dir = tempfile.mkdtemp(prefix=f"ab_{v}_")
            try:
                t0 = time.time()
                n = run_pipeline(spark, sf_dir, out_dir, **VARIANTS[v])[
                    "canonical_triples"].count()
                pipe[v].append(round(time.time() - t0, 2))
                triples[v] = n
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
            release()
        for name, fn in (("kg_same_as_components", q.kg_same_as_components),
                         ("td_ann_lsh_topk", q.td_ann_lsh_topk)):
            t0 = time.time()
            fn(spark, sf_dir).count()
            controls[name].append(round(time.time() - t0, 2))
            release()

    med = {v: round(statistics.median(s), 2) for v, s in pipe.items()}
    ctl_spread = {
        name: {"shots": s, "median": round(statistics.median(s), 2),
               "spread_pct": round(100 * (max(s) - min(s))
                                   / statistics.median(s), 1)}
        for name, s in controls.items()}
    print(json.dumps({
        "metric": "ab_pipeline_marginal_cost",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "pipeline_shots": pipe,
        "pipeline_median": med,
        "n_triples": triples,
        "marginal_adm4_sec": round(med["FULL"] - med["NOADM4"], 2),
        "marginal_fuzzy_gate_sec": round(med["NOADM4"] - med["R3GATE"], 2),
        "marginal_total_sec": round(med["FULL"] - med["R3GATE"], 2),
        "controls": ctl_spread,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
