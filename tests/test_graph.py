"""Connected components / dedup cluster resolution (operators/graph.py)."""

from __future__ import annotations

from wp_etl_migration_spark.operators.graph import (
    connected_components, dedup_keep_list)


def test_connected_components_two_clusters_and_chain(spark):
    # {1,2,3} via chain 1-2-3, {10,11} direct; chain forces >1 round.
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], ["id_a", "id_b"])
    got = sorted(tuple(r) for r in connected_components(pairs).collect())
    assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


def test_connected_components_long_chain(spark):
    # Path 0-1-2-...-9: diameter 9 exercises multi-round convergence.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["id_a", "id_b"])
    got = connected_components(pairs).collect()
    assert {r.component for r in got} == {0} and len(got) == 10


def test_empty_pairs_keep_everything(spark):
    # The no-near-dups case: components empty, keep-list = whole corpus.
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).collect() == []
    df = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    assert sorted(r.doc_id for r in
                  dedup_keep_list(df, empty, "doc_id").collect()) == [1, 2]


def test_contamination_broadcast_overlap(spark):
    from wp_etl_migration_spark.operators.dedup import contamination
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over it"),
         (2, "completely different words entirely here now")],
        ["doc_id", "text"])
    ev = spark.createDataFrame(
        [(99, "the quick brown fox jumps again")], ["doc_id", "text"])
    got = contamination(corpus, ev, "doc_id", "text", n=5).collect()
    # only doc 1 shares a 5-gram ("the quick brown fox jumps")
    assert [(r.doc_id, r.n_shared) for r in got] == [(1, 1)]
    plan = contamination(corpus, ev, "doc_id", "text", n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dedup_keep_list(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 4), (4, 5)], ["id_a", "id_b"])
    keep = sorted(r.doc_id for r in
                  dedup_keep_list(df, pairs, "doc_id").collect())
    # cluster {1,4,5} keeps 1; 0/2/3 untouched.
    assert keep == [0, 1, 2, 3]
