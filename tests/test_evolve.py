"""Schema evolution (operators/evolve.py): action-plan pins for every
action kind, try_cast one-bad-value-one-cell semantics vs a DuckDB
TRY_CAST oracle, the cast-loss report's exact counts, and the
extra-column contract in all three modes."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.evolve import cast_loss_report, evolve_schema

TARGET = "doc_id bigint, score double, lang string, added_at timestamp"


def _src(spark):
    # doc_id arrives as string (retype), score as string with junk
    # (lossy cast), lang matches, added_at missing, legacy_col extra
    return spark.createDataFrame(
        [
            ("1", "0.5", "en", "x"),
            ("2", "oops", "es", "y"),
            ("not-an-id", "1.25", "fr", "z"),
            ("4", None, None, "w"),
        ],
        "doc_id string, score string, lang string, legacy_col string",
    )


def test_plan_and_conformance(spark):
    out, plan = evolve_schema(_src(spark), TARGET)
    assert out.columns == ["doc_id", "score", "lang", "added_at"]
    actions = {p["column"]: p["action"] for p in plan}
    assert actions == {
        "doc_id": "cast",
        "score": "cast",
        "lang": "pass",
        "added_at": "add_null",
        "legacy_col": "drop",
    }
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double", "string", "timestamp",
    ]
    rows = {r.lang: r for r in out.collect()}
    assert rows["en"].doc_id == 1 and rows["en"].score == 0.5
    assert rows["es"].doc_id == 2 and rows["es"].score is None  # junk -> NULL
    assert rows["fr"].doc_id is None and rows["fr"].score == 1.25
    assert all(r.added_at is None for r in rows.values())


def test_try_cast_matches_duckdb(spark):
    out, _ = evolve_schema(_src(spark), TARGET)
    got = {
        (r.doc_id, r.score, r.lang) for r in out.select("doc_id", "score", "lang").collect()
    }
    want = {
        tuple(t)
        for t in duckdb.sql(
            """
            SELECT TRY_CAST(doc_id AS BIGINT), TRY_CAST(score AS DOUBLE), lang
            FROM (VALUES ('1','0.5','en'), ('2','oops','es'),
                         ('not-an-id','1.25','fr'), ('4',NULL,NULL))
                 t(doc_id, score, lang)
            """
        ).fetchall()
    }
    assert got == want


def test_cast_loss_report_exact_counts(spark):
    rep = {r.column: r for r in cast_loss_report(_src(spark), TARGET).collect()}
    assert set(rep) == {"doc_id", "score"}  # only the retyped columns
    assert rep["doc_id"].n_values == 4 and rep["doc_id"].n_lost == 1
    assert rep["score"].n_values == 3 and rep["score"].n_lost == 1
    assert rep["score"].loss_ratio == pytest.approx(1 / 3)
    # no casts -> empty report with stable schema
    same = cast_loss_report(
        _src(spark).select("lang"), "lang string"
    )
    assert same.count() == 0
    assert same.columns == ["column", "n_values", "n_lost", "loss_ratio"]


def test_cast_loss_report_is_one_scan(spark):
    # the report must ride ONE scan+aggregation however many columns are
    # retyped — a per-column union would re-scan the corpus per column
    rep = cast_loss_report(_src(spark), TARGET)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1, plan
    # one partial + one final aggregate, not a pair per cast column
    assert plan.count("HashAggregate") <= 2, plan


def test_on_extra_modes(spark):
    src = _src(spark)
    kept, plan = evolve_schema(src, TARGET, on_extra="keep")
    assert kept.columns[-1] == "legacy_col"
    assert {p["action"] for p in plan if p["column"] == "legacy_col"} == {"keep"}
    with pytest.raises(ValueError, match="legacy_col"):
        evolve_schema(src, TARGET, on_extra="error")
    with pytest.raises(ValueError, match="on_extra"):
        evolve_schema(src, TARGET, on_extra="explode")
