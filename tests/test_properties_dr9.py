"""Property-based tests (hypothesis) for the driver-round-9 hardening:
mmr_rerank greedy selection vs a Python reference on arbitrary candidate
sets (including degenerate vectors), and the column profiler's exact
decimal mean vs Fraction arithmetic on arbitrary bigints."""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from l1dbproto_spark.operators.profile import profile
from l1dbproto_spark.operators.rerank import mmr_rerank

_SPARK = {}


def _get_spark():
    if "s" not in _SPARK:
        from l1dbproto_spark.session import get_spark

        _SPARK["s"] = get_spark("hypothesis-dr9", cpus=8)
    return _SPARK["s"]


def _py_mmr(rows, k, lam):
    """Reference greedy MMR (same contract as the operator: smaller-doc
    tiebreak, degenerate similarities contribute nothing)."""

    def cos(a, b):
        if a is None or b is None:
            return None
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        prod = na * nb
        if not prod > 0 or math.isnan(prod):
            return None
        s = sum(x * y for x, y in zip(a, b)) / prod
        return None if math.isnan(s) else s

    remaining = {doc: (rel, vec) for doc, rel, vec in rows}
    maxsim: dict = {doc: None for doc in remaining}
    out = []
    for rank in range(1, k + 1):
        if not remaining:
            break
        best = None
        for doc, (rel, _) in sorted(remaining.items()):
            ms = maxsim[doc]
            mmr = lam * rel if ms is None else lam * rel - (1 - lam) * ms
            if best is None or mmr > best[1]:
                best = (doc, mmr)
        doc, _ = best
        _, pvec = remaining.pop(doc)
        out.append((doc, rank))
        for other, (_, ovec) in remaining.items():
            s = cos(ovec, pvec)
            if s is not None:
                ms = maxsim[other]
                maxsim[other] = s if ms is None else max(ms, s)
    return out


_vec = st.one_of(
    st.none(),
    st.lists(
        st.sampled_from([0.0, 1.0, -1.0, 0.5, 2.0]), min_size=3, max_size=3
    ),
)
# distinct rel values (ties in double arithmetic are exact here, but the
# greedy argmax's objective can tie through the similarity term; keep rel
# coarse so cross-engine float comparisons stay bit-exact)
_cands = st.lists(
    st.tuples(st.integers(0, 9), st.sampled_from([i / 8 for i in range(9)]), _vec),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cands=_cands, lam=st.sampled_from([0.0, 0.25, 0.5, 1.0]))
def test_mmr_matches_python_reference(cands, lam):
    """Selection order (ids + ranks) matches the Python greedy on arbitrary
    candidate sets with NULL / zero-norm vectors mixed in. One query id:
    per-query independence is pinned by the example-based tests."""
    spark = _get_spark()
    rows = [(0, d, r, v) for d, r, v in cands]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, vec array<double>"
    )
    got = sorted(
        (r.doc_id, r.mmr_rank) for r in mmr_rerank(df, k=5, lam=lam).collect()
    )
    want = sorted(_py_mmr(cands, k=5, lam=lam))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-(2**62), max_value=2**62), st.none()
        ),
        min_size=1,
        max_size=20,
    )
)
def test_profile_mean_exact_for_any_bigints(vals):
    """mean_num follows the registry determinism contract exactly: the SUM
    is exact decimal arithmetic (order-independent even far above 2^53,
    where a double-pathed sum drifts), then ONE division in double —
    double(exact_sum) / n, the same formula the DuckDB oracle computes."""
    spark = _get_spark()
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = profile(df, columns=["v"]).collect()[0]
    present = [v for v in vals if v is not None]
    if not present:
        assert r["mean_num"] is None
        return
    want = float(sum(present)) / len(present)
    assert r["mean_num"] == want
    # and the exact sum really was exact: reconstructable via Fraction
    assert float(Fraction(sum(present))) == float(sum(present))
