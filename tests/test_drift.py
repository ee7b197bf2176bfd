"""Distribution drift (operators/drift.py): exact-KS Python/DuckDB
re-derivations over documents snapshots, the binned-KS lower-bound
property and grid-aligned equality, chi-square/TVD references with the
top-mover pin, identical-snapshot zeros, and report shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.drift import (
    categorical_drift,
    drift_report,
    ks_drift,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _old(spark):
    return load_table(spark, SF_DIR, "documents")


def _new(spark):
    # drop short docs and re-source a third — a real drift shape
    d = load_table(spark, SF_DIR, "documents")
    return d.filter(F.col("n_chars") >= 120).withColumn(
        "source",
        F.when(F.col("doc_id") % 3 == 0, F.lit("refetch")).otherwise(
            F.col("source")
        ),
    )


def _py_ks(a_vals, b_vals):
    xs = sorted(set(a_vals) | set(b_vals))
    na, nb = len(a_vals), len(b_vals)
    ca = cb = 0
    from collections import Counter

    a_c, b_c = Counter(a_vals), Counter(b_vals)
    d = 0.0
    for x in xs:
        ca += a_c.get(x, 0)
        cb += b_c.get(x, 0)
        d = max(d, abs(ca / na - cb / nb))
    return d


def test_exact_ks_matches_python_and_duckdb(spark):
    got = ks_drift(_old(spark), _new(spark), "n_chars").collect()[0]
    a = [r.n_chars for r in _old(spark).select("n_chars").collect()]
    b = [r.n_chars for r in _new(spark).select("n_chars").collect()]
    assert got.statistic == pytest.approx(_py_ks(a, b), abs=1e-12)
    assert (got.n_old, got.n_new) == (len(a), len(b))
    duck = duckdb.connect()
    want = duck.execute(
        f"""
        WITH o AS (SELECT n_chars AS k, COUNT(*) AS n_old
                   FROM '{SF_DIR}/documents.parquet'
                   WHERE n_chars IS NOT NULL GROUP BY 1),
        n AS (SELECT n_chars AS k, COUNT(*) AS n_new
              FROM '{SF_DIR}/documents.parquet'
              WHERE n_chars >= 120 GROUP BY 1),
        j AS (SELECT COALESCE(o.k, n.k) AS k,
                     COALESCE(n_old, 0) AS n_old,
                     COALESCE(n_new, 0) AS n_new
              FROM o FULL OUTER JOIN n ON o.k = n.k),
        e AS (SELECT k,
                     CAST(SUM(n_old) OVER w AS DOUBLE)
                       / (SELECT SUM(n_old) FROM j) AS f_old,
                     CAST(SUM(n_new) OVER w AS DOUBLE)
                       / (SELECT SUM(n_new) FROM j) AS f_new
              FROM j WINDOW w AS (ORDER BY k
                                  ROWS UNBOUNDED PRECEDING))
        SELECT MAX(ABS(f_old - f_new)) FROM e
        """
    ).fetchone()[0]
    duck.close()
    assert got.statistic == pytest.approx(want, abs=1e-12)
    assert got.statistic > 0.1  # the planted drift is visible


def test_binned_ks_lower_bound_and_grid_equality(spark):
    exact = ks_drift(_old(spark), _new(spark), "n_chars").collect()[0].statistic
    for bins in (8, 64, 512):
        binned = (
            ks_drift(_old(spark), _new(spark), "n_chars", bins=bins)
            .collect()[0]
            .statistic
        )
        assert binned <= exact + 1e-12
    # grid-aligned synthetic: uniform ints 0..99 vs +50 shift, bins=2
    # puts the whole shift on the bin edge -> binned == exact == 0.5
    a = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    b = spark.range(1000).select(
        ((F.col("id") % 100) + 50).cast("double").alias("x")
    )
    exact2 = ks_drift(a, b, "x").collect()[0].statistic
    binned2 = ks_drift(a, b, "x", bins=3).collect()[0].statistic
    assert exact2 == pytest.approx(0.5)
    assert binned2 == pytest.approx(0.5)
    with pytest.raises(ValueError, match="bins"):
        ks_drift(a, b, "x", bins=1)


def test_categorical_drift_matches_python(spark):
    got = categorical_drift(_old(spark), _new(spark), "source").collect()[0]
    from collections import Counter

    a = Counter(r.source for r in _old(spark).select("source").collect())
    b = Counter(
        r.source
        for r in _new(spark).select("source").collect()
    )
    ta, tb = sum(a.values()), sum(b.values())
    chi = tvd = 0.0
    best_k, best_s = None, -1.0
    for k in sorted(set(a) | set(b)):
        na, nb = a.get(k, 0), b.get(k, 0)
        eo = (na + nb) * ta / (ta + tb)
        en = (na + nb) * tb / (ta + tb)
        chi += round((na - eo) ** 2 / eo + (nb - en) ** 2 / en, 9)
        shift = round(abs(na / ta - nb / tb), 9)
        tvd += shift
        if shift > best_s:
            best_k, best_s = k, shift
    assert got.statistic == pytest.approx(chi, abs=1e-9)
    assert got.tvd == pytest.approx(tvd / 2, abs=1e-9)
    assert got.top_mover == best_k
    assert got.statistic > 0  # 'refetch' is a planted new category


def test_identical_snapshots_are_zero(spark):
    d = _old(spark)
    assert ks_drift(d, d, "n_chars").collect()[0].statistic == 0.0
    cat = categorical_drift(d, d, "lang").collect()[0]
    assert cat.statistic == 0.0 and cat.tvd == 0.0


def test_report_shape_and_validation(spark):
    rep = drift_report(
        _old(spark),
        _new(spark),
        numeric_cols=["n_chars", "doc_id"],
        categorical_cols=["source", "lang"],
        bins=32,
    ).collect()
    assert len(rep) == 4
    kinds = {(r.column, r.kind) for r in rep}
    assert kinds == {
        ("n_chars", "ks"),
        ("doc_id", "ks"),
        ("source", "chi2"),
        ("lang", "chi2"),
    }
    for r in rep:
        if r.kind == "ks":
            assert r.tvd is None and r.top_mover is None
        else:
            assert r.tvd is not None and r.top_mover is not None
    with pytest.raises(ValueError, match="no columns"):
        drift_report(_old(spark), _new(spark))


def test_binned_ks_scans_each_side_twice_max(spark):
    """The pooled min/max is pinned: each parquet side is scanned once
    for its counts and once inside the (checkpointed) pooled aggregate —
    never re-run per crossJoin consumer."""
    import re as _re

    df = ks_drift(_old(spark), _new(spark), "n_chars", bins=32)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = len(_re.findall(r"documents\.parquet", plan))
    assert n_scans <= 2, f"documents scanned {n_scans}x in the binned-KS plan"


def test_psi_matches_python_reference(spark):
    import math

    from collections import Counter

    from l1dbproto_spark.operators.drift import PSI_EPS

    got = categorical_drift(_old(spark), _new(spark), "source").collect()[0]
    a = Counter(r.source for r in _old(spark).select("source").collect())
    b = Counter(r.source for r in _new(spark).select("source").collect())
    ta, tb = sum(a.values()), sum(b.values())
    psi = 0.0
    for k in set(a) | set(b):
        po = max(a.get(k, 0) / ta, PSI_EPS)
        pn = max(b.get(k, 0) / tb, PSI_EPS)
        psi += round((pn - po) * math.log(pn / po), 9)
    # 'refetch' exists only in new -> the eps floor fires on the old side
    assert got.psi == pytest.approx(psi, abs=1e-7)
    assert got.psi > 1.0  # a brand-new category is a huge PSI signal
    # identical snapshots -> psi exactly 0 on both legs
    d = _old(spark)
    assert categorical_drift(d, d, "lang").collect()[0].psi == 0.0
    assert ks_drift(d, d, "n_chars", bins=16).collect()[0].psi == 0.0
    # numeric binned psi is positive under the planted n_chars shift
    assert (
        ks_drift(_old(spark), _new(spark), "n_chars", bins=16)
        .collect()[0]
        .psi
        > 0.01
    )
    # the report carries psi on every row
    rep = drift_report(
        _old(spark), _new(spark), numeric_cols=["n_chars"],
        categorical_cols=["source"], bins=16,
    ).collect()
    assert all(r.psi is not None for r in rep)


def test_binned_ks_excludes_nulls(spark):
    """r12 ADVICE (high): least() skips NULLs, so a NULL value used to
    land in the TOP bin (and in bin 0 on the hi==lo branch) — identical
    distributions plus NULLs on one side read as drift. Binned mode must
    match exact mode's NULLs-excluded contract."""
    a = spark.range(10).select(F.col("id").cast("double").alias("x"))
    b = a.unionByName(
        spark.range(5).select(F.lit(None).cast("double").alias("x"))
    )
    for bins in (4, None):
        got = ks_drift(a, b, "x", bins=bins).collect()[0]
        assert got.statistic == 0.0, f"bins={bins}: NULLs leaked into a bin"
        assert got.psi == 0.0
        assert (got.n_old, got.n_new) == (10, 10)
    # hi==lo branch (constant column): NULLs must not land in bin 0
    const_a = spark.range(10).select(F.lit(7.0).alias("x"))
    const_b = const_a.unionByName(
        spark.range(5).select(F.lit(None).cast("double").alias("x"))
    )
    got = ks_drift(const_a, const_b, "x", bins=4).collect()[0]
    assert got.statistic == 0.0 and (got.n_old, got.n_new) == (10, 10)


def test_exact_mode_distinct_cap_guard(spark):
    """Exact mode's bounded-distinct contract is enforced, not advisory:
    more distinct values than the cap raises loudly; an explicit None
    disables the guard; binned mode is untouched by it."""
    a = spark.range(100).select(F.col("id").cast("double").alias("x"))
    b = spark.range(100).select((F.col("id") + 3).cast("double").alias("x"))
    with pytest.raises(ValueError, match="distinct values exceeds"):
        ks_drift(a, b, "x", max_exact_distinct=50)
    # under the cap / guard disabled / binned: all fine
    assert ks_drift(a, b, "x", max_exact_distinct=500).collect()[0].statistic > 0
    assert ks_drift(a, b, "x", max_exact_distinct=None).collect()[0].statistic > 0
    assert ks_drift(a, b, "x", bins=8, max_exact_distinct=5).collect()[0].n_old == 100


def test_empty_side_emits_null_statistic(spark):
    """r12 ADVICE (low): a side with zero non-null rows has no defined
    statistic — the row must carry NULL (the documented empty-side
    contract), never a silent 0.0 that reads as 'no drift'."""
    a = spark.range(10).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 3).cast("string").alias("c"),
    )
    empty = a.filter(F.lit(False))
    for bins in (None, 4):
        got = ks_drift(a, empty, "x", bins=bins).collect()[0]
        assert got.statistic is None
    got = categorical_drift(a, empty, "c").collect()[0]
    assert got.statistic is None
    # all-NULL side is the same as an empty side
    all_null = spark.range(5).select(F.lit(None).cast("double").alias("x"))
    assert ks_drift(a, all_null, "x", bins=4).collect()[0].statistic is None


def test_embedding_drift_catches_rotated_mix(spark):
    """embedding_drift (r13): centroid-cell shares through
    categorical_drift over a planted cluster-mix rotation — the old
    snapshot is 80/20 across two cells, the new one 50/50, so the exact
    share arithmetic predicts TVD = 0.3; identical snapshots read 0."""
    from l1dbproto_spark.operators.drift import embedding_drift

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cluster int, centroid array<double>",
    )

    def snap(n, one_in):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.when(
                F.col("id") % one_in == 0,
                F.array(F.lit(0.1), F.lit(0.9)),
            )
            .otherwise(F.array(F.lit(0.9), F.lit(0.1)))
            .alias("embedding"),
        )

    old, new = snap(100, 5), snap(100, 2)
    got = embedding_drift(old, new, cents, dim=2).collect()[0]
    assert got.column == "embedding" and got.kind == "chi2"
    assert got.tvd == pytest.approx(0.3, abs=1e-9)
    assert got.statistic > 0 and got.top_mover in ("0", "1")
    assert (got.n_old, got.n_new) == (100, 100)
    same = embedding_drift(old, old, cents, dim=2).collect()[0]
    assert same.statistic == 0.0 and same.tvd == 0.0 and same.psi == 0.0
    # the plan never shuffles a vector: assignment is a broadcast
    # map-side argmax, the exchange carries (cluster, counts) only
    plan = (
        embedding_drift(old, new, cents, dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_quantile_drift_reference_bins(spark):
    """quantile_drift (r13): equal-mass reference bins — a Python mirror
    re-derives the whole statistic from the operator's own pinned edges
    rule (percentile_approx on the reference, strict-below bin count),
    a long-tailed planted shift is caught where fixed-width binning goes
    blind, identical snapshots read exactly 0, and validation raises."""
    from collections import Counter

    from l1dbproto_spark.operators.drift import quantile_drift

    # long-tailed column: 990 values in [0, 99], 10 huge outliers — a
    # fixed-width grid puts ~everything in bin 0
    def snap(shift):
        return spark.range(1000).select(
            F.when(F.col("id") % 100 == 0, F.lit(1e6))
            .otherwise((F.col("id") % 99).cast("double") + shift)
            .alias("x")
        )

    old, new = snap(0.0), snap(30.0)
    got = quantile_drift(old, new, "x", q=10).collect()[0]
    assert got.column == "x" and got.kind == "chi2"
    assert got.statistic > 0 and got.tvd > 0.1  # the shift is visible
    # fixed-width 10-bin KS on the same data is nearly blind: the tail
    # outlier stretches the grid so the whole shift hides in bin 0
    from l1dbproto_spark.operators.drift import ks_drift

    blind = ks_drift(old, new, "x", bins=10).collect()[0]
    assert blind.statistic < got.tvd

    # Python mirror of the full rule, from the same edge definition
    edges = (
        old.filter(F.col("x").isNotNull())
        .agg(
            F.percentile_approx(
                "x", [i / 10 for i in range(1, 10)], 10_000
            ).alias("e")
        )
        .collect()[0]
        .e
    )
    a = [r.x for r in old.collect()]
    b = [r.x for r in new.collect()]

    def bins(vals):
        return Counter(str(sum(1 for e in edges if v > e)) for v in vals)

    ca, cb = bins(a), bins(b)
    ta, tb = sum(ca.values()), sum(cb.values())
    chi = tvd = 0.0
    for k in sorted(set(ca) | set(cb)):
        na, nb = ca.get(k, 0), cb.get(k, 0)
        eo = (na + nb) * ta / (ta + tb)
        en = (na + nb) * tb / (ta + tb)
        chi += round((na - eo) ** 2 / eo + (nb - en) ** 2 / en, 9)
        tvd += round(abs(na / ta - nb / tb), 9)
    assert got.statistic == pytest.approx(chi, abs=1e-9)
    assert got.tvd == pytest.approx(tvd / 2, abs=1e-9)
    assert (got.n_old, got.n_new) == (1000, 1000)

    # identical snapshots -> exact zero; empty new side -> NULL; q guard
    same = quantile_drift(old, old, "x", q=10).collect()[0]
    assert same.statistic == 0.0 and same.tvd == 0.0 and same.psi == 0.0
    empty = quantile_drift(old, old.filter(F.lit(False)), "x").collect()[0]
    assert empty.statistic is None
    with pytest.raises(ValueError, match="q must be"):
        quantile_drift(old, new, "x", q=1)


def test_quantile_drift_planted_driver_grade(spark):
    """r14 promotion candidate (COVERAGE.md queue): the planted
    quantile-drift row at full driver-grade compare — the operator's
    percentile_approx edges are the provable order statistics (1,3,5)
    by fixture construction, so the oracle re-derives the whole binned
    chi-square/TVD machinery from hard-coded edges."""
    import duckdb

    from l1dbproto_spark.queries.monitoring import (
        QUANTILE_DRIFT_PLANTED_ORACLE,
        quantile_drift_planted,
    )
    from tools.check_correctness import compare

    sf = "/root/testdata/sf0.001"
    got = quantile_drift_planted(spark, sf).toPandas()
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = duck.execute(QUANTILE_DRIFT_PLANTED_ORACLE).df()
    duck.close()
    assert len(got) == 1
    assert got["tvd"].iloc[0] > 0.2  # the planted remap is a big shift
    issues = compare("quantile_drift_planted", got, want)
    assert not issues, issues


def test_quantile_drift_empty_reference_is_null(spark):
    """An empty REFERENCE side has no quantile edges — the row carries
    NULL statistics per the empty-side contract (the docstring's claim,
    now pinned), never a crash or a silent zero."""
    from l1dbproto_spark.operators.drift import quantile_drift

    a = spark.range(20).select(F.col("id").cast("double").alias("x"))
    r = quantile_drift(a.filter(F.lit(False)), a, "x", q=4).collect()[0]
    assert r.statistic is None and r.tvd is None
