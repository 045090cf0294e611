"""Connected components / duplicate clustering (ext/graph.py)."""

from __future__ import annotations

import pytest

from lakehouse_tools_spark.ext.graph import connected_components


def _cc(spark, edges, vertices, **kw):
    e = spark.createDataFrame(edges or [(None, None)], "doc_id long, doc_id2 long")
    if not edges:
        e = e.filter("doc_id is not null")
    v = spark.createDataFrame([(x,) for x in vertices], "doc_id long")
    return {
        (r.doc_id, r.cluster_id)
        for r in connected_components(e, v, **kw).collect()
    }


def test_two_components_and_singleton(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (99, 99)}


def test_chain_needs_multiple_rounds(spark):
    # a path graph: min label must walk the whole chain
    chain = [(i, i + 1) for i in range(1, 8)]
    got = _cc(spark, chain, list(range(1, 9)))
    assert got == {(i, 1) for i in range(1, 9)}


def test_edge_order_and_direction_irrelevant(spark):
    a = _cc(spark, [(5, 2), (2, 9)], [2, 5, 9])
    b = _cc(spark, [(9, 2), (2, 5)], [2, 5, 9])
    assert a == b == {(2, 2), (5, 2), (9, 2)}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, [], [1, 2, 3])
    assert got == {(1, 1), (2, 2), (3, 3)}


def test_nonconvergence_raises(spark):
    chain = [(i, i + 1) for i in range(1, 6)]
    with pytest.raises(RuntimeError):
        _cc(spark, chain, list(range(1, 7)), max_rounds=1)
