"""Property-based tests (hypothesis) for the round-9 families: binary
signatures vs a Python reference packer at arbitrary dims, the interval
overlap join vs a brute-force O(n^2) reference at random widths, and the
ordered funnel vs a sequential Python fold."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from l1dbproto_spark.operators.analytics import funnel_times
from l1dbproto_spark.operators.interval_join import interval_overlap_join
from l1dbproto_spark.operators.quantize import binary_signature, hamming

_SPARK = {}


def _get_spark():
    if "s" not in _SPARK:
        from l1dbproto_spark.session import get_spark

        _SPARK["s"] = get_spark("hypothesis-r9", cpus=8)
    return _SPARK["s"]


def _py_sig(vec, dim):
    words = [0] * ((dim + 63) // 64)
    for i, x in enumerate(vec):
        if x > 0:
            words[i // 64] |= 1 << (i % 64)
    # to signed int64
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    dim=st.integers(min_value=1, max_value=200),
    data=st.data(),
)
def test_binary_signature_and_hamming_any_dim(dim, data):
    """Packing matches the Python reference at any dim (multiword + tail),
    and Hamming equals the positionwise sign-mismatch count."""
    vals = st.floats(
        min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
    )
    a = data.draw(st.lists(vals, min_size=dim, max_size=dim))
    b = data.draw(st.lists(vals, min_size=dim, max_size=dim))
    spark = _get_spark()
    df = spark.createDataFrame(
        [(1, a), (2, b)], "id long, v array<double>"
    ).withColumn("sig", binary_signature(F.col("v"), dim))
    rows = {r.id: list(r.sig) for r in df.collect()}
    assert rows[1] == _py_sig(a, dim)
    assert rows[2] == _py_sig(b, dim)
    left = df.filter(F.col("id") == 1).select(F.col("sig").alias("sa"))
    right = df.filter(F.col("id") == 2).select(F.col("sig").alias("sb"))
    got = left.crossJoin(right).select(
        hamming(F.col("sa"), F.col("sb")).alias("h")
    ).collect()[0].h
    want = sum(1 for x, y in zip(a, b) if (x > 0) != (y > 0))
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    iv=st.lists(
        st.tuples(
            st.floats(min_value=-1000, max_value=1000, allow_nan=False),
            st.floats(min_value=0, max_value=300, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    ),
    width=st.floats(min_value=0.5, max_value=500, allow_nan=False),
)
def test_interval_overlap_join_matches_bruteforce(iv, width):
    """Bucketed overlap join == O(n^2) reference at ANY bucket width,
    including widths far smaller/larger than the interval lengths."""
    spark = _get_spark()
    rows = [(i, s, s + ln) for i, (s, ln) in enumerate(iv)]
    a = spark.createDataFrame(rows, "aid long, as double, ae double")
    b = spark.createDataFrame(rows, "bid long, bs double, be double")
    got = {
        (r.aid, r.bid)
        for r in interval_overlap_join(
            a, b, "as", "ae", "bs", "be", bucket_width=width
        ).collect()
    }
    want = {
        (i, j)
        for i, s1, e1 in rows
        for j, s2, e2 in rows
        if s1 <= e2 and s2 <= e1
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # user
            st.integers(min_value=0, max_value=50),  # minute
            st.sampled_from(["a", "b", "c", "x"]),  # stage or noise
        ),
        min_size=1,
        max_size=60,
    )
)
def test_funnel_times_matches_sequential_reference(events):
    """Chained-window funnel == the obvious per-user sequential fold."""
    spark = _get_spark()
    stages = ["a", "b", "c"]
    rows = [
        (i, float(m), u, t) for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts double, user_id long, event_type string"
    )
    got = {
        r.user_id: (r.t0, r.t1, r.t2)
        for r in funnel_times(df, stages).collect()
    }

    def ref(user):
        evs = sorted((m, t) for _, m, u, t in rows if u == user)
        t = [None, None, None]
        for i, stage in enumerate(stages):
            prev = t[i - 1] if i else None
            cand = [
                m
                for m, ty in evs
                if ty == stage and (prev is None if i == 0 else prev is not None and m > prev)
            ]
            t[i] = min(cand) if cand and (i == 0 or t[i - 1] is not None) else None
        return tuple(t)

    for u in {u for u, _, _ in events}:
        assert got[u] == ref(u), (u, got[u], ref(u))
