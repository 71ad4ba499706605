"""Incremental dedup: batch-parity and behavior tests.

The invariant that makes incremental ingest trustworthy: running batch 1,
persisting (state, groups), then merging batch 2 must yield EXACTLY the
groups of the one-shot signature pass over batch1 UNION batch2 — same
components, same keepers, same member counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_linked_open_data_kg_spark.operators.incremental_dedup import (
    incremental_dup_groups,
    signature_dup_groups,
    signature_dup_state,
)

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
         "psi omega one two three four five six").split()


def _doc(seed_words: list[str], change_last: str | None = None) -> str:
    w = list(seed_words)
    if change_last is not None:
        w[-1] = change_last
    return " ".join(w)


@pytest.fixture(scope="module")
def corpus(spark):
    """batch1: an exact-dup pair (1,2), a singleton (3), a near-dup pair
    (4,5). batch2 (higher doc_ids, append-only): an exact copy of doc 1
    (joins the old group), a near-dup of the old singleton 3, a fresh
    new-new pair (13,14), and an unrelated singleton (15)."""
    a = WORDS[:24]                    # 24-token base text A
    b = [w + "x" for w in WORDS[:24]]  # disjoint base text B
    c = [w + "y" for w in WORDS[:24]]  # disjoint base text C
    batch1 = [
        (1, _doc(a)),
        (2, _doc(a)),                         # exact dup of 1
        (3, _doc(b)),                         # singleton (so far)
        (4, _doc(c)),
        (5, _doc(c, change_last="violetz")),  # near dup of 4
    ]
    batch2 = [
        (11, _doc(a)),                        # joins old group {1,2}
        (12, _doc(b, change_last="sevenq")),  # near dup of old singleton 3
        (13, _doc([w + "z" for w in WORDS[:24]])),
        (14, _doc([w + "z" for w in WORDS[:24]], change_last="mixw")),
        (15, " ".join(w + "w" for w in WORDS[24:30] * 2)),  # unrelated
    ]
    schema = "doc_id long, text string"
    return (spark.createDataFrame(batch1, schema),
            spark.createDataFrame(batch2, schema))


def _rows(df):
    return {(r["group_id"], r["doc_id"], r["is_keeper"], r["n_members"])
            for r in df.collect()}


def test_incremental_equals_one_shot_batch(spark, corpus):
    b1, b2 = corpus
    state1 = signature_dup_state(b1).localCheckpoint()
    groups1 = signature_dup_groups(state1).localCheckpoint()

    state2 = signature_dup_state(b2).localCheckpoint()
    inc = incremental_dup_groups(state2, state1, groups1)

    full_state = signature_dup_state(b1.unionByName(b2))
    want = signature_dup_groups(full_state)
    assert _rows(inc) == _rows(want)


def test_batch1_groups_shape(spark, corpus):
    b1, _ = corpus
    g = {r["doc_id"]: r for r in
         signature_dup_groups(signature_dup_state(b1)).collect()}
    assert set(g) == {1, 2, 4, 5}          # 3 is a singleton: absent
    assert g[1]["group_id"] == g[2]["group_id"] == 1
    assert g[4]["group_id"] == g[5]["group_id"] == 4
    assert g[1]["n_members"] == 2 and g[4]["n_members"] == 2


def test_merge_covers_old_group_old_singleton_and_new_pair(spark, corpus):
    b1, b2 = corpus
    state1 = signature_dup_state(b1).localCheckpoint()
    groups1 = signature_dup_groups(state1).localCheckpoint()
    inc = {r["doc_id"]: r for r in
           incremental_dup_groups(signature_dup_state(b2), state1,
                                  groups1).collect()}
    assert inc[11]["group_id"] == 1 and inc[11]["n_members"] == 3
    assert inc[12]["group_id"] == 3 and inc[3]["n_members"] == 2
    assert inc[13]["group_id"] == inc[14]["group_id"] == 13
    assert 15 not in inc                    # unrelated doc stays out
    # untouched old group {4,5} survives the merge verbatim
    assert inc[4]["group_id"] == inc[5]["group_id"] == 4
    assert inc[4]["n_members"] == 2


def test_identical_docs_estimate_full_jaccard(spark):
    df = spark.createDataFrame(
        [(1, " ".join(WORDS[:20])), (2, " ".join(WORDS[:20]))],
        "doc_id long, text string")
    st = signature_dup_state(df).withColumn("is_new", F.lit(True))
    from geo_linked_open_data_kg_spark.operators.incremental_dedup import (
        _estimated_pairs,
    )
    [p] = _estimated_pairs(st, 12, 4, 0.5, 50, new_only=False).collect()
    assert (p["doc_a"], p["doc_b"], p["est_jaccard"]) == (1, 2, 1.0)


def test_estimated_pairs_plan_never_goes_quadratic(spark, corpus):
    """Candidates must only materialize inside a (band, bucket) — the
    same no-cartesian lock the batch LSH carries."""
    from geo_linked_open_data_kg_spark.operators.incremental_dedup import (
        _estimated_pairs,
    )
    b1, _ = corpus
    st = signature_dup_state(b1).withColumn("is_new", F.lit(True))
    plan = (_estimated_pairs(st, 12, 4, 0.5, 50, new_only=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def _mk_doc(doc_id: int, tpl: int, muts: int) -> tuple[int, str]:
    vocab = [f"t{k}" for k in range(40)]
    templates = [vocab[0:24],
                 [w + "x" for w in vocab[0:24]],
                 [w + "y" for w in vocab[0:24]],
                 vocab[10:34]]
    w = list(templates[tpl])
    for m in range(muts):
        w[(7 * m + 3) % len(w)] = f"m{doc_id}_{m}"
    return doc_id, " ".join(w)


def test_incremental_parity_randomized(spark):
    """Hypothesis-driven batch parity: random template/mutation corpora
    with borderline similarities (templates 0 and 3 overlap ~40%, right
    at the estimator threshold) and random batch splits must still make
    incremental == one-shot — the crafted-corpus parity generalized."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(data=st.data())
    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def prop(data):
        n1 = data.draw(st.integers(2, 7), label="n1")
        n2 = data.draw(st.integers(1, 6), label="n2")
        docs1 = [_mk_doc(i, data.draw(st.integers(0, 3)),
                         data.draw(st.integers(0, 4)))
                 for i in range(n1)]
        docs2 = [_mk_doc(100 + i, data.draw(st.integers(0, 3)),
                         data.draw(st.integers(0, 4)))
                 for i in range(n2)]
        schema = "doc_id long, text string"
        b1 = spark.createDataFrame(docs1, schema)
        b2 = spark.createDataFrame(docs2, schema)
        state1 = signature_dup_state(b1).localCheckpoint()
        groups1 = signature_dup_groups(state1).localCheckpoint()
        inc = incremental_dup_groups(
            signature_dup_state(b2).localCheckpoint(), state1, groups1)
        want = signature_dup_groups(
            signature_dup_state(b1.unionByName(b2)))
        assert _rows(inc) == _rows(want)

    prop()
