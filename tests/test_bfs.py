"""Multi-source BFS distances (operators/graph.py bfs_distances): hand
graphs, a Python-reference property on random graphs, directed mode,
long-chain early-exit, and the loud max_hops refusal."""

from __future__ import annotations

from collections import deque

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from l1dbproto_spark.operators.graph import bfs_distances

_SPARK = {}


def _get_spark():
    if "s" not in _SPARK:
        from l1dbproto_spark.session import get_spark

        _SPARK["s"] = get_spark("bfs-tests", cpus=8)
    return _SPARK["s"]


def _run(edges, sources, **kw):
    spark = _get_spark()
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {r.node: r.dist for r in bfs_distances(e, s, **kw).collect()}


def _py_bfs(edges, sources, directed=False):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_hand_graph(spark):
    #  0-1-2-3   4-5   6 (isolated, unreachable)
    edges = [(0, 1), (1, 2), (2, 3), (4, 5)]
    got = _run(edges, [0])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # multi-source: min distance to ANY source
    got2 = _run(edges, [0, 3])
    assert got2 == {0: 0, 3: 0, 1: 1, 2: 1}
    # second component reached only from its own seed
    got3 = _run(edges, [4])
    assert got3 == {4: 0, 5: 1}


def test_bfs_directed_mode(spark):
    edges = [(0, 1), (1, 2)]
    assert _run(edges, [0], directed=True) == {0: 0, 1: 1, 2: 2}
    # no back edges: 2 reaches nothing
    assert _run(edges, [2], directed=True) == {2: 0}


def test_bfs_long_chain_and_refusal(spark):
    chain = [(i, i + 1) for i in range(15)]
    got = _run(chain, [0], max_hops=20)
    assert got[15] == 15
    with pytest.raises(RuntimeError, match="still expanding"):
        _run(chain, [0], max_hops=3)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=30,
    ),
    n_sources=st.integers(min_value=1, max_value=3),
)
def test_bfs_matches_python_reference(edges, n_sources):
    nodes = sorted({x for e in edges for x in e})
    sources = nodes[:n_sources]
    got = _run(edges, sources)
    want = _py_bfs(edges, sources)
    assert got == want
