"""Bloom filter operators (operators/bloom.py): the no-false-negative
guarantee, designed false-positive rate, union mergeability, parquet
persistence, and the prefilter composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.bloom import (
    bloom_build,
    bloom_load,
    bloom_might_contain,
    bloom_params,
    bloom_save,
    bloom_union,
    filter_definitely_new,
)

M, K = bloom_params(1000, fpr=0.01)


def _items(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.md5(F.col("id").cast("string")).alias("fp")
    )


def test_params_shape():
    m, k = bloom_params(1000, 0.01)
    assert m >= 9000 and 5 <= k <= 10  # textbook ~9585 bits / 7 hashes
    assert bloom_params(0, 0.01) == (64, 1)


def test_no_false_negatives(spark):
    inserted = _items(spark, 0, 1000)
    bloom = bloom_build(inserted, "fp", M, K).cache()
    flagged = bloom_might_contain(inserted, bloom, "fp", M, K)
    assert flagged.filter(~F.col("might_contain")).count() == 0
    # word table bounded by construction
    assert bloom.count() <= M // 64 + 1


def test_false_positive_rate_near_design(spark):
    bloom = bloom_build(_items(spark, 0, 1000), "fp", M, K).cache()
    fresh = _items(spark, 1000, 4000)
    n_fp = (
        bloom_might_contain(fresh, bloom, "fp", M, K)
        .filter(F.col("might_contain"))
        .count()
    )
    assert n_fp / 3000 < 0.03  # designed 1%, allow 3x slack


def test_union_equals_build_on_union(spark):
    a, b = _items(spark, 0, 400), _items(spark, 400, 900)
    u = bloom_union(
        bloom_build(a, "fp", M, K), bloom_build(b, "fp", M, K)
    )
    direct = bloom_build(a.unionByName(b), "fp", M, K)
    got = {(r.word_idx, r.word) for r in u.collect()}
    want = {(r.word_idx, r.word) for r in direct.collect()}
    assert got == want


def test_definitely_new_prefilter(spark):
    inserted = _items(spark, 0, 1000)
    bloom = bloom_build(inserted, "fp", M, K).cache()
    mixed = _items(spark, 500, 2000)  # 500 seen + 1000 new
    new = {r.fp for r in filter_definitely_new(mixed, bloom, "fp", M, K).collect()}
    seen = {r.fp for r in inserted.collect()}
    truly_new = {r.fp for r in _items(spark, 1000, 2000).collect()}
    assert new.isdisjoint(seen)  # no false negatives -> nothing seen leaks
    assert new <= truly_new
    assert len(new) >= 0.95 * len(truly_new)  # FPs only nibble the edge


def test_parquet_roundtrip(spark, tmp_path):
    """Persistence goes through bloom_save/bloom_load (the geometry-checked
    path — raw spark.read.parquet is deprecated for filters, see the
    module docstring's migration note). A frame that still carries the
    format sentinel probes identically to the stripped one:
    bloom_might_contain only joins real word rows."""
    from l1dbproto_spark.operators.bloom import bloom_load, bloom_save

    bloom = bloom_build(_items(spark, 0, 300), "fp", M, K)
    bloom_save(bloom, str(tmp_path / "bloom"), M, K)
    loaded = bloom_load(spark, str(tmp_path / "bloom"), M, K)
    raw_with_sentinel = spark.read.parquet(str(tmp_path / "bloom"))
    fresh = _items(spark, 0, 300)
    a = bloom_might_contain(fresh, bloom, "fp", M, K).filter(
        F.col("might_contain")
    ).count()
    b = bloom_might_contain(fresh, loaded, "fp", M, K).filter(
        F.col("might_contain")
    ).count()
    c = bloom_might_contain(fresh, raw_with_sentinel, "fp", M, K).filter(
        F.col("might_contain")
    ).count()
    assert a == b == c == 300


def test_save_load_roundtrip_and_format_check(spark, tmp_path):
    """bloom_save persists a format-fingerprint sentinel; bloom_load
    verifies it and strips it. Loading under ANY different geometry
    (m, k, or salt) — or loading a bare word table persisted without the
    marker — raises instead of silently probing wrong bit positions."""
    path = str(tmp_path / "bloom_v")
    bloom = bloom_build(_items(spark, 0, 300), "fp", M, K)
    bloom_save(bloom, path, M, K)
    loaded = bloom_load(spark, path, M, K)
    # sentinel stripped: loaded word table identical to the built one
    got = {(r.word_idx, r.word) for r in loaded.collect()}
    want = {(r.word_idx, r.word) for r in bloom.collect()}
    assert got == want
    n = (
        bloom_might_contain(_items(spark, 0, 300), loaded, "fp", M, K)
        .filter(F.col("might_contain"))
        .count()
    )
    assert n == 300  # no false negatives through the persisted path
    # any geometry mismatch is loud
    with pytest.raises(ValueError, match="different format"):
        bloom_load(spark, path, M, K + 1)
    with pytest.raises(ValueError, match="different format"):
        bloom_load(spark, path, M * 2, K)
    with pytest.raises(ValueError, match="different format"):
        bloom_load(spark, path, M, K, salt="bloom-v1")
    # a pre-versioning store (no marker) is rejected, not probed
    bare = str(tmp_path / "bloom_bare")
    bloom.write.parquet(bare)
    with pytest.raises(ValueError, match="no format marker"):
        bloom_load(spark, bare, M, K)


def test_null_and_duplicate_values(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), (None,)], "fp string"
    )
    bloom = bloom_build(_items(spark, 0, 10), "fp", M, K)
    out = bloom_might_contain(df, bloom, "fp", M, K).collect()
    assert len(out) == 3  # row count preserved
    assert all(not r.might_contain or r.fp is not None for r in out)


def test_probe_join_carries_no_hint(spark):
    """The word table's size is a parameter that can reach hundreds of
    MBs at large designed capacity — the probe join must leave sizing to
    AQE (no mandatory broadcast in the logical plan)."""
    bloom = bloom_build(_items(spark, 0, 100), "fp", M, K)
    out = bloom_might_contain(_items(spark, 0, 50), bloom, "fp", M, K)
    logical = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical
