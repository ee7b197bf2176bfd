"""Round-10 registered rows: graph mining + data-quality validation.

``part_copurchase_triangles`` drives the degree-ordered triangle counter
(operators/graph.py) over a graph derived from the relational tables, and
``data_quality_report`` drives the one-scan check suite
(operators/checks.py) — both against full ANSI-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.checks import CheckSuite
from ..operators.graph import triangle_counts
from ..sources.catalog import load_table
from . import query


@query(
    "part_copurchase_triangles",
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_quantity >= 25 AND b.l_quantity >= 25
    ),
    t AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, COUNT(*) AS triangles FROM (
      SELECT a AS node FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t
    ) GROUP BY node
    """,
    survey="graph mining: degree-ordered triangle counting (operators/graph.py triangles)",
)
def part_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle membership in the co-purchase graph (parts bought
    together in one order, high-quantity lines only — the basket-analysis
    graph whose triangle density is a standard cohesion signal).

    Scale shape: the edge derivation shuffles lineitem once on the order
    key (self-join per order is bounded by order size); the counter's
    degree-ordered orientation bounds the wedge join at O(sqrt(m))
    out-degree per node, so part-popularity skew cannot blow it up —
    the same plan the near-dup pair graphs get."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 25)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        # no .distinct() here: triangle_counts canonicalizes (least/greatest
        # + distinct) as its first step, so a query-side dedup would just
        # add a second exchange over the same pairs
    )
    return triangle_counts(edges, "u", "v")


@query(
    "bfs_distances",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_quantity >= 25 AND b.l_quantity >= 25
    ),
    und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    seeds AS (SELECT DISTINCT u AS node FROM und WHERE u % 500 = 0),
    walk(node, dist) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT und.v, walk.dist + 1
      FROM walk JOIN und ON und.u = walk.node
      WHERE walk.dist < 40
    )
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY node
    """,
    survey="graph mining: multi-source BFS hop distances (operators/graph.py bfs_distances; second driver row for the iterative-fixpoint family)",
)
def bfs_distances_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance of every part from a deterministic seed set (partkeys
    divisible by 500) over the SAME co-purchase graph the triangle row
    derives — multi-source BFS as iterative frontier expansion
    (operators/graph.py bfs_distances), checked against a DuckDB
    recursive-CTE oracle (UNION-distinct walk, MIN(dist) per node).

    Scale shape: each round is one equi-join frontier expansion + one
    anti-join against the visited set, both on the uniform node key; the
    loop exits when a frontier empties, so total work is O(edges within
    the reached radius) — at sf0.01 the graph is 3 hops deep from the 4
    seeds, and the oracle's dist<40 guard is far beyond the radius on
    both sides (the operator RAISES if still expanding at its cap, so a
    truncation can never silently diverge from the oracle)."""
    from ..operators.graph import bfs_distances

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 25)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    seeds = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .filter(F.col("node") % 500 == 0)
        .distinct()
    )
    return bfs_distances(edges, seeds, src="u", dst="v", max_hops=40)


# Check-suite thresholds for the documents table: every metric below is
# order-independent-exact (0/1 indicator averages, integer-exact sums and
# counts, one final division) so the driver's bit-level value hash holds —
# see the determinism contract in queries/__init__.py.
_LANGS = ["en", "de", "fr", "es", "zh"]


def _documents_suite() -> CheckSuite:
    return (
        CheckSuite()
        .completeness("text", min_ratio=0.5)
        .uniqueness("doc_id")
        .in_range("n_chars", 0, 10_000_000)
        .matches("lang", "^[a-z][a-z]$", min_ratio=0.5)
        .in_set("lang", _LANGS, min_ratio=0.5)
        .satisfies("text_nonempty", F.length("text") > 0, min_ratio=0.5)
        .row_count(min_rows=1)
        .mean_between("n_chars", 1.0, 1e9)
    )


@query(
    "data_quality_report",
    oracle="""
    WITH m AS (
      SELECT
        AVG(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END) AS completeness,
        COUNT(DISTINCT doc_id) * 1.0 / COUNT(*) AS uniqueness,
        AVG(CASE WHEN n_chars BETWEEN 0 AND 10000000
                 THEN 1.0 ELSE 0.0 END) AS in_range,
        AVG(CASE WHEN regexp_matches(lang, '^[a-z][a-z]$')
                 THEN 1.0 ELSE 0.0 END) AS matches,
        AVG(CASE WHEN lang IN ('en','de','fr','es','zh')
                 THEN 1.0 ELSE 0.0 END) AS in_set,
        AVG(CASE WHEN length(text) > 0 THEN 1.0 ELSE 0.0 END) AS nonempty,
        COUNT(*) * 1.0 AS row_count,
        AVG(n_chars) AS mean_n_chars
      FROM documents
    ),
    r AS (
      SELECT 'completeness(text)' AS check, completeness AS metric,
             0.5 AS lo, 1.0 AS hi FROM m
      UNION ALL SELECT 'uniqueness(doc_id)', uniqueness, 1.0, 1.0 FROM m
      UNION ALL SELECT 'in_range(n_chars)', in_range, 1.0, 1.0 FROM m
      UNION ALL SELECT 'matches(lang)', matches, 0.5, 1.0 FROM m
      UNION ALL SELECT 'in_set(lang)', in_set, 0.5, 1.0 FROM m
      UNION ALL SELECT 'satisfies(text_nonempty)', nonempty, 0.5, 1.0 FROM m
      UNION ALL SELECT 'row_count', row_count, 1.0, 1e308 FROM m
      UNION ALL SELECT 'mean(n_chars)', mean_n_chars, 1.0, 1e9 FROM m
    )
    SELECT "check", metric, lo, hi, metric BETWEEN lo AND hi AS passed FROM r
    """,
    survey="ext: ingest validation (one-scan declarative check suite; operators/checks.py)",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents ingest gate: eight declarative constraints
    (completeness, key uniqueness, range, regex, value set, custom
    predicate, row count, mean band) verified in ONE scan — the plan is
    a single aggregation over a single FileScan, unpivoted to the
    (check, metric, lo, hi, passed) audit record."""
    docs = load_table(spark, sf_dir, "documents")
    return _documents_suite().run(docs)
