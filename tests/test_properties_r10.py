"""Property-based tests (hypothesis) for the round-10 families: the graph
miners vs Python references on arbitrary random graphs (triangles,
coreness, LPA labels' closure under the node set), and the check suite vs
pandas-computed metrics on random frames with NULLs."""

from __future__ import annotations

import itertools

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from l1dbproto_spark.operators.checks import CheckSuite
from l1dbproto_spark.operators.graph import (
    core_numbers,
    k_core,
    triangle_counts,
)

_SPARK = {}


def _get_spark():
    if "s" not in _SPARK:
        from l1dbproto_spark.session import get_spark

        _SPARK["s"] = get_spark("hypothesis-r10", cpus=8)
    return _SPARK["s"]


def _edges_strategy():
    pair = st.tuples(
        st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)
    )
    return st.lists(pair, min_size=1, max_size=60)


def _clean(edges):
    return {(min(u, v), max(u, v)) for u, v in edges if u != v}


def _py_triangles(clean):
    adj: dict[int, set[int]] = {}
    for u, v in clean:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts: dict[int, int] = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _py_cores(clean):
    adj: dict[int, set[int]] = {}
    for u, v in clean:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    core, k, live = {}, 0, {n: set(s) for n, s in adj.items()}
    while live:
        node = min(live, key=lambda n: (len(live[n]), n))
        k = max(k, len(live[node]))
        core[node] = k
        for nb in live.pop(node):
            live[nb].discard(node)
    return core


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy())
def test_triangles_and_cores_any_graph(edges):
    """Triangle counts and core numbers match the Python references on
    arbitrary messy edge lists (self-loops, duplicates, reversals)."""
    clean = _clean(edges)
    if not clean:
        return
    spark = _get_spark()
    df = spark.createDataFrame(list(edges), "src INT, dst INT")
    got_tri = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got_tri == _py_triangles(clean)
    got_core = {r.node: r.core for r in core_numbers(df).collect()}
    want_core = _py_cores(clean)
    assert got_core == want_core
    kmax = max(want_core.values())
    got_k = {r.node for r in k_core(df, kmax).collect()}
    assert got_k == {n for n, c in want_core.items() if c >= kmax}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.one_of(st.none(), st.text(alphabet="ab", max_size=4)),
            st.integers(min_value=-5, max_value=100),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_check_suite_metrics_any_frame(rows):
    """Suite metrics equal pandas-computed metrics on random frames with
    NULL text: completeness, uniqueness, predicate rate, row count."""
    spark = _get_spark()
    df = spark.createDataFrame(rows, "id LONG, txt STRING, n LONG")
    report = {
        r.check: r.metric
        for r in (
            CheckSuite()
            .completeness("txt")
            .uniqueness("id")
            .in_range("n", 0, 100)
            .satisfies("txt_a", F.col("txt").startswith("a"), 0.5)
            .row_count()
            .run(df)
            .collect()
        )
    }
    pdf = pd.DataFrame(rows, columns=["id", "txt", "n"])
    n = len(pdf)
    assert report["row_count"] == float(n)
    assert report["completeness(txt)"] == pdf["txt"].notna().sum() / n
    assert report["uniqueness(id)"] == pdf["id"].nunique() / n
    assert report["in_range(n)"] == pdf["n"].between(0, 100).sum() / n
    starts = pdf["txt"].fillna("").str.startswith("a").sum() / n
    assert report["satisfies(txt_a)"] == starts
