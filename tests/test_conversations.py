"""Conversation (SFT/chat) operators (operators/conversations.py):
DuckDB re-derivation of the structural report and the transcript
fingerprint over a documents-synthesized turn table, an independent
Python reference for the budgeted render, span-slice exactness, protocol
edge contracts, and plan pins (one exchange, zero Python)."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.conversations import (
    conversation_fingerprints,
    conversation_report,
    render_conversations,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
_WS = r"[ \t\r\n\f]+"

# deterministic turn table over documents: conv = doc_id % 40, idx =
# doc_id // 40; conv%5==0 conversations open with a system turn, the
# rest alternate user/assistant from idx parity — so some conversations
# satisfy the protocol and some (system convs whose idx-1 parity is
# shifted) exercise every failure leg
_N_CONV = 40


def _turns(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    conv = F.col("doc_id") % _N_CONV
    idx = (F.col("doc_id") / _N_CONV).cast("long")
    role = (
        F.when((idx == 0) & (conv % 5 == 0), F.lit("system"))
        .when(idx % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    return docs.select(
        conv.alias("conv_id"),
        idx.alias("turn_idx"),
        role.alias("role"),
        F.col("text").alias("content"),
    )


_DUCK_TURNS = f"""
    SELECT doc_id % {_N_CONV} AS conv_id,
           doc_id // {_N_CONV} AS turn_idx,
           CASE WHEN doc_id // {_N_CONV} = 0 AND doc_id % {_N_CONV} % 5 = 0
                THEN 'system'
                WHEN (doc_id // {_N_CONV}) % 2 = 0 THEN 'user'
                ELSE 'assistant' END AS role,
           text AS content
    FROM '{SF_DIR}/documents.parquet'
"""


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_report_matches_duckdb(spark, duck):
    got = {
        tuple(r)
        for r in conversation_report(_turns(spark)).collect()
    }
    # the oracle re-derives every column relationally: lead_sys from the
    # first non-system turn, alternation against the (idx - lead_sys)
    # parity, emptiness/dup from plain aggregates
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
        WITH t AS ({_DUCK_TURNS}),
        lead AS (
          SELECT conv_id,
                 COALESCE(MIN(CASE WHEN role <> 'system' THEN turn_idx END),
                          COUNT(*)) AS first_non_sys
          FROM t GROUP BY conv_id
        ),
        per AS (
          SELECT t.conv_id,
                 COUNT(*) AS n_turns,
                 CAST(SUM(CASE WHEN role = 'system' THEN 1 ELSE 0 END) AS BIGINT) AS n_system,
                 CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
                 COUNT(*) FILTER (turn_idx >= first_non_sys) > 0 AS starts_ok,
                 COALESCE(bool_and(CASE WHEN turn_idx >= first_non_sys THEN
                   role = CASE WHEN (turn_idx - first_non_sys) % 2 = 0
                               THEN 'user' ELSE 'assistant' END END), FALSE)
                   AND COUNT(*) FILTER (turn_idx >= first_non_sys) > 0 AS alternates,
                 bool_and(trim(content) <> '') AS no_empty,
                 COUNT(DISTINCT turn_idx) = COUNT(*) AS no_dup_idx
          FROM t JOIN lead USING (conv_id)
          GROUP BY t.conv_id
        )
        SELECT conv_id, n_turns, n_system, n_assistant, starts_ok,
               alternates, no_empty, no_dup_idx,
               starts_ok AND alternates AND no_empty AND no_dup_idx AS ok
        FROM per
        """
        ).fetchall()
    }
    assert got == want and len(got) == _N_CONV
    # the fixture exercises both verdicts
    oks = {r[-1] for r in got}
    assert oks == {True, False}


def test_fingerprints_match_duckdb_and_invariances(spark, duck):
    got = {
        (r.conv_id, r.fingerprint)
        for r in conversation_fingerprints(_turns(spark)).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
        WITH t AS ({_DUCK_TURNS})
        SELECT conv_id,
               md5(string_agg(
                 role || chr(31) ||
                 regexp_replace(trim(content), '[ \t\r\n\f]+', ' ', 'g'),
                 chr(30) ORDER BY turn_idx)) AS fingerprint
        FROM t GROUP BY conv_id
        """
        ).fetchall()
    }
    assert got == want and len(got) == _N_CONV
    # invariances: re-indexed turn numbering and whitespace jitter fold
    base = [(1, 0, "user", "hello world"), (1, 1, "assistant", "hi")]
    renum = [(1, 10, "user", "hello   world"), (1, 20, "assistant", " hi ")]
    caseflip = [(1, 0, "user", "hello world"), (1, 1, "Assistant", "hi")]
    schema = "conv_id long, turn_idx int, role string, content string"

    def fp(rows):
        return conversation_fingerprints(
            spark.createDataFrame(rows, schema)
        ).collect()[0].fingerprint

    assert fp(base) == fp(renum)
    assert fp(base) != fp(caseflip)  # roles are case-significant


def _py_render(rows, max_tokens):
    """Independent greedy reference for render_conversations."""
    rows = sorted(rows)
    turns = [(r, c) for _, r, c in [(i, r, c) for i, r, c in rows]]
    lead = 0
    while lead < len(turns) and turns[lead][0] == "system":
        lead += 1
    sys_block, rest = turns[:lead], turns[lead:]

    def tok(role, content):
        return len(re.split(_WS, f"{role}: {content}".strip()))

    budget = max(max_tokens - sum(tok(*t) for t in sys_block), 0)
    kept_rest, acc = [], 0
    for t in reversed(rest):
        w = tok(*t)
        if acc + w <= budget or not kept_rest:
            kept_rest.insert(0, t)
            acc += w
        else:
            break
    kept = sys_block + kept_rest
    text, spans, pos = "", [], 0
    for role, content in kept:
        line = f"{role}: {content}"
        if pos:
            text += "\n"
            pos += 1
        if role == "assistant":
            spans.append((pos + len(role) + 2, pos + len(line)))
        text += line
        pos += len(line)
    return (
        text,
        len(kept),
        len(turns) - len(kept),
        sum(tok(*t) for t in kept),
        spans,
    )


def test_render_matches_python_reference(spark):
    rows = [
        (int(r.conv_id), int(r.turn_idx), r.role, r.content)
        for r in _turns(spark).collect()
    ]
    by_conv = {}
    for c, i, r, t in rows:
        by_conv.setdefault(c, []).append((i, r, t))
    for budget in (30, 200):
        got = {
            r.conv_id: (
                r.text,
                r.n_turns_kept,
                r.n_turns_dropped,
                r.n_tokens,
                [(s.s, s.e) for s in r.assistant_spans],
            )
            for r in render_conversations(
                _turns(spark), max_tokens=budget
            ).collect()
        }
        want = {c: _py_render(v, budget) for c, v in by_conv.items()}
        assert got == want


def test_spans_slice_to_assistant_content(spark):
    out = render_conversations(_turns(spark), max_tokens=120).collect()
    assert any(r.assistant_spans for r in out)
    for r in out:
        for sp in r.assistant_spans:
            piece = r.text[sp.s : sp.e]
            # every span is exactly one kept assistant turn's content
            assert ("assistant: " + piece) in r.text
        assert r.n_turns_kept + r.n_turns_dropped >= r.n_turns_kept


def test_render_edge_contracts(spark):
    schema = "conv_id long, turn_idx int, role string, content string"
    rows = [
        (1, 0, "system", "Be brief."),
        (1, 1, "user", "a very long question with many many tokens here"),
        (1, 2, "assistant", "short answer"),
        (2, 0, "user", "this single final turn is far over the tiny budget"),
        (3, 0, "system", "only instructions"),
    ]
    got = {
        r.conv_id: r
        for r in render_conversations(
            spark.createDataFrame(rows, schema), max_tokens=6
        ).collect()
    }
    # system pinned + final turn kept, middle dropped
    assert got[1].text == "system: Be brief.\nassistant: short answer"
    assert (got[1].n_turns_kept, got[1].n_turns_dropped) == (2, 1)
    # oversize single final turn still renders
    assert got[2].n_turns_kept == 1 and got[2].n_tokens > 6
    # all-system conversation renders its system block
    assert got[3].text == "system: only instructions"
    assert got[3].assistant_spans == []
    with pytest.raises(ValueError, match="max_tokens"):
        render_conversations(spark.createDataFrame(rows, schema), max_tokens=0)


def test_plans_one_exchange_zero_python(spark):
    for df in (
        conversation_report(_turns(spark)),
        conversation_fingerprints(_turns(spark)),
        render_conversations(_turns(spark), max_tokens=64),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 2  # partial+final of ONE groupBy
        assert "Python" not in plan


def test_fingerprints_feed_streaming_dedup_gate(spark, tmp_path):
    """The docstring's composition claim, end to end: conversation
    fingerprints keyed by conv_id run through the streaming exact-dedup
    gate — a later re-delivery of the same dialogue (renumbered turns,
    whitespace jitter, new conv_id) is rejected as a duplicate."""
    from l1dbproto_spark.streaming.doc_dedup import StreamingDocDedup

    schema = "conv_id long, turn_idx int, role string, content string"
    batch1 = spark.createDataFrame(
        [
            (1, 0, "user", "hello world"),
            (1, 1, "assistant", "hi"),
            (2, 0, "user", "different dialogue"),
            (2, 1, "assistant", "indeed"),
        ],
        schema,
    )
    # conv 30 duplicates conv 1 (renumbered + whitespace); conv 31 is new
    batch2 = spark.createDataFrame(
        [
            (30, 5, "user", "hello   world"),
            (30, 9, "assistant", " hi "),
            (31, 0, "user", "fresh"),
            (31, 1, "assistant", "pair"),
        ],
        schema,
    )
    gate = StreamingDocDedup(
        spark, str(tmp_path / "conv_fps"), text_col="fingerprint",
        id_col="conv_id",
    )
    adm1 = gate.admit(conversation_fingerprints(batch1), epoch_id=0)
    assert {r.conv_id for r in adm1.collect()} == {1, 2}
    adm2 = gate.admit(conversation_fingerprints(batch2), epoch_id=1)
    assert {r.conv_id for r in adm2.collect()} == {31}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcxyz", min_size=1, max_size=6)
_content = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_role = st.sampled_from(["system", "user", "assistant"])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    turns=st.lists(
        st.tuples(st.integers(0, 30), _role, _content),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(min_value=1, max_value=40),
)
def test_render_property_matches_python_reference(spark, turns, budget):
    """Any turn table (random roles/indexes/content, including blank
    contents and mid-conversation system turns) renders exactly like the
    independent Python greedy reference."""
    rows = [(7, i, r, c) for i, r, c in turns]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, content string"
    )
    out = render_conversations(df, max_tokens=budget).collect()
    assert len(out) == 1
    r = out[0]
    want = _py_render([(i, ro, c) for i, ro, c in turns], budget)
    got = (
        r.text,
        r.n_turns_kept,
        r.n_turns_dropped,
        r.n_tokens,
        [(s.s, s.e) for s in r.assistant_spans],
    )
    assert got == want
    # span-slice exactness holds on arbitrary content
    for s, e in got[4]:
        assert ("assistant: " + r.text[s:e]) in r.text


def test_null_turn_never_silent(spark):
    """r12 ADVICE (medium): a NULL content (or role) turn used to vanish
    from the fingerprint identity (concat propagates NULL, array_join
    DROPS null elements), NULL the whole rendered text, and turn the
    report's no_empty/ok into NULL instead of false. The coalesce at the
    shared _sorted_turns entry point makes all three legs loud."""
    rows = [
        # conv 1: clean two-turn dialogue
        (1, 0, "user", "hi"),
        (1, 1, "assistant", "hello"),
        # conv 2: same dialogue plus a NULL-content turn in the middle
        (2, 0, "user", "hi"),
        (2, 1, None, None),
        (2, 2, "assistant", "hello"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, content string"
    )
    # fingerprints: the NULL turn keeps its position -> convs distinct
    fps = {r.conv_id: r.fingerprint for r in conversation_fingerprints(df).collect()}
    assert fps[1] is not None and fps[2] is not None
    assert fps[1] != fps[2]
    # report: the NULL turn flags no_empty = false (not NULL), ok = false
    rep = {r.conv_id: r for r in conversation_report(df).collect()}
    assert rep[1].no_empty is True
    assert rep[2].no_empty is False and rep[2].ok is False
    # render: text never NULL; the NULL turn renders as ': ' line
    out = {r.conv_id: r for r in render_conversations(df, max_tokens=100).collect()}
    assert out[1].text == "user: hi\nassistant: hello"
    assert out[2].text is not None
    assert out[2].text == "user: hi\n: \nassistant: hello"
    # span-slice exactness still holds around the NULL turn
    for s, e in [(sp.s, sp.e) for sp in out[2].assistant_spans]:
        assert out[2].text[s:e] == "hello"
