"""Bloom filters as column algebra — compact set-membership state for
ingestion gates (the Dolma pipeline deduplicates URLs and paragraphs
with exactly this structure).

Spark's internal bloom expressions back its runtime join filters but are
not SQL-exposed, so the engine builds the classic structure from
first-class operators — and gains properties the opaque binary form
lacks:

* the filter IS a DataFrame — (word_idx, word) rows holding an m-bit
  bitmap as 64-bit words — so it persists as parquet, broadcasts into
  probe joins, and MERGES by ``bit_or`` aggregation (union of filters ==
  filter of union, partial-aggregatable across partitions/snapshots);
* probe positions use Kirsch-Mitzenmacher double hashing
  (``pos_j = (h1 + j * (1 + h2 mod (m-1))) mod m``, step forced nonzero —
  two md5-derived portable
  hashes generate all k probes, and the inner ``mod`` keeps every
  intermediate far from int64 overflow, ANSI-safe);
* build is one explode to (item, position) + one 64-fold-smaller
  ``bit_or`` aggregation; membership is probe-explode + a join against
  the m/64-row word table + an all-probes-hit count. The word table is
  m/64 rows — a PARAMETER, not data-dependent, but m scales with the
  designed capacity: ~10^8 items at 1% FPR is ~1.2e9 bits (~15 MB of
  words, comfortably a broadcast), while 10^9+ items cross into the
  hundreds of MBs where a mandatory broadcast would be the exact
  antipattern this engine removed from its drop-set anti-joins — so the
  probe join carries NO hint and AQE sizes it (shuffle join on word_idx
  when the filter is big). For 10^10-item state, shard the filter by a
  key prefix (one bloom per shard, the ``bloom_union`` mergeability is
  what makes per-shard builds fold).

Guarantee: no false negatives — ``filter_definitely_new`` never drops a
genuinely new item, which is the property an ingestion prefilter needs
(false positives only cost a redundant exact check downstream).

Standard sizing: m = -n ln p / (ln 2)^2, k = (m/n) ln 2
(:func:`bloom_params`). No reference analog; sibling of the HLL /
quantile / heavy-hitter sketches (operators/sketches.py).

Persistence & MIGRATION (format v2): persist filters ONLY through
:func:`bloom_save` / :func:`bloom_load` — the pair carries a format
fingerprint (probe-geometry version + m + k + salt) and refuses to load
under any mismatch. A raw ``df.write.parquet`` / ``spark.read.parquet``
round-trip of the word table is DEPRECATED for filters: it skips that
verification, and probing a filter whose geometry differs from the
probe-time parameters emits silent FALSE NEGATIVES — the one failure
this structure promises never to produce. Concretely, any filter
persisted under probe-geometry v1 (the pre-``BLOOM_FORMAT_VERSION``
releases: plain ``h2 mod m`` step, default salt ``bloom-v1``) must be
REBUILT from its source items under the current defaults; there is no
in-place upgrade, because the persisted words encode the old bit
positions. :func:`bloom_might_contain` tolerates a riding format
sentinel (it probes only real word rows), so frames from
:func:`bloom_load` and legacy raw loads probe identically — but only
``bloom_load`` checks the geometry.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

#: Probe-geometry version. v2 = Kirsch-Mitzenmacher step forced NONZERO
#: (``1 + h2 mod (m-1)``). A filter persisted under the v1 geometry
#: (plain ``h2 mod m`` step) probes DIFFERENT bit positions, so probing
#: it with v2 code could report "definitely new" for an inserted item —
#: a silent false negative, the one failure the structure promises never
#: to produce. The default salt therefore carries the version (stale
#: filters mismatch every probe rather than subtly some), and
#: :func:`bloom_save`/:func:`bloom_load` persist/verify an explicit
#: format fingerprint so the mismatch is LOUD, mirroring the
#: ``_check_store_schema`` contract of the streaming gate stores.
BLOOM_FORMAT_VERSION = 2

#: Sentinel ``word_idx`` for the persisted format row. Probe positions
#: are ``pmod(..)`` in [0, m), so no real word ever has a negative index.
_FORMAT_IDX = -1


def _format_word(m_bits: int, k: int, salt: str) -> int:
    """Deterministic int64 fingerprint of the filter's full identity:
    probe-geometry version + sizing + salt. Any difference in any of
    them changes which bits an item sets, so all of them must match
    between build time and probe time."""
    payload = f"bloomfmt|{BLOOM_FORMAT_VERSION}|{m_bits}|{k}|{salt}"
    digest = hashlib.md5(payload.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def bloom_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` at target false-positive rate
    ``fpr`` — the textbook formulas, rounded up/to-nearest."""
    if n_items <= 0:
        return 64, 1
    m = max(64, int(math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2))))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions(col: Column, m_bits: int, k: int, salt: str) -> Column:
    """Array of k probe bit-positions via double hashing."""
    h1 = portable_hash64(col, salt + "-h1")
    # step forced NONZERO (1..m_bits-1): h2 == 0 would collapse all k
    # probes onto h1, silently degrading that key's effective k to 1 and
    # its FPR from fill^k to ~fill (review find; standard KM constructions
    # force the step odd/nonzero for the same reason)
    h2 = F.lit(1) + F.pmod(portable_hash64(col, salt + "-h2"), F.lit(m_bits - 1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.pmod(h1 + j * h2, F.lit(m_bits)),
    )


def bloom_build(
    items: DataFrame,
    col: str,
    m_bits: int,
    k: int = 5,
    salt: str = "bloom-v2",
) -> DataFrame:
    """Build the filter over a string column: (word_idx, word) rows, one
    per NON-ZERO 64-bit word of the bitmap (<= m_bits/64 rows). One
    explode + one uniform-key ``bit_or`` aggregation; map-side partial
    aggregation shrinks the shuffle to the word table's size."""
    pos = F.explode(
        _positions(F.col(col).cast("string"), m_bits, k, salt)
    ).alias("_pos")
    return (
        items.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("word_idx"),
            # PySpark's shiftleft wrapper takes only a literal shift; the
            # SQL form accepts a column-valued one
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two filters built with the same (m_bits, k, salt):
    bit_or per word — union of filters == filter of the unioned items
    (pinned in tests). Partial-aggregatable, so snapshots/partitions can
    each build locally and fold."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def bloom_save(
    bloom: DataFrame,
    path: str,
    m_bits: int,
    k: int = 5,
    salt: str = "bloom-v2",
) -> None:
    """Persist the filter as parquet WITH its identity: one sentinel row
    (``word_idx = -1``, ``word`` = the :func:`_format_word` fingerprint of
    version + m_bits + k + salt) rides alongside the real words. Loading
    under any different geometry fails loudly instead of silently probing
    wrong bit positions (see :data:`BLOOM_FORMAT_VERSION`)."""
    spark = bloom.sparkSession
    marker = spark.createDataFrame(
        [(int(_FORMAT_IDX), _format_word(m_bits, k, salt))],
        "word_idx LONG, word LONG",
    )
    bloom.select(
        F.col("word_idx").cast("long"), F.col("word").cast("long")
    ).unionByName(marker).write.mode("overwrite").parquet(path)


def bloom_load(
    spark: SparkSession,
    path: str,
    m_bits: int,
    k: int = 5,
    salt: str = "bloom-v2",
) -> DataFrame:
    """Load a filter persisted by :func:`bloom_save`, verifying the format
    fingerprint against the caller's (m_bits, k, salt) under the CURRENT
    probe-geometry version. Raises ``ValueError`` on any mismatch — a
    stale or differently-parameterized filter must be rebuilt, never
    probed (a wrong-geometry probe can emit false negatives). Returns the
    word table with the sentinel stripped."""
    stored = spark.read.parquet(path)
    markers = [
        r.word for r in stored.filter(F.col("word_idx") == _FORMAT_IDX).collect()
    ]
    expected = _format_word(m_bits, k, salt)
    if not markers:
        raise ValueError(
            f"bloom filter at {path} has no format marker: persisted before "
            "format-versioning (probe geometry v1) or not a bloom_save "
            "store. Rebuild it with bloom_build + bloom_save."
        )
    if markers != [expected]:
        raise ValueError(
            f"bloom filter at {path} was built under a different format "
            f"(marker {markers} != expected {expected} for version="
            f"{BLOOM_FORMAT_VERSION}, m_bits={m_bits}, k={k}, salt={salt!r}). "
            "Probing it would risk false negatives; rebuild it."
        )
    return stored.filter(F.col("word_idx") != _FORMAT_IDX)


def bloom_might_contain(
    batch: DataFrame,
    bloom: DataFrame,
    col: str,
    m_bits: int,
    k: int = 5,
    salt: str = "bloom-v2",
    flag_col: str = "might_contain",
) -> DataFrame:
    """Annotate each row: true iff ALL k probe bits are set (possibly
    present — false positives at the designed rate), false iff any probe
    misses (DEFINITELY absent). Probe explode -> join against the word
    table (no hint — AQE broadcasts a small filter and shuffles a big
    one; see the module docstring for the size regimes) -> per-row hit
    count; original columns are preserved."""
    probes = (
        batch.select(
            F.col(col).alias("_item"),
            F.explode(
                _positions(F.col(col).cast("string"), m_bits, k, salt)
            ).alias("_pos"),
        )
        .distinct()
        .select(
            "_item",
            (F.col("_pos") / 64).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_bit"),
        )
    )
    hits = (
        probes.join(bloom, "word_idx", "left")
        .withColumn(
            "_hit",
            (F.coalesce("word", F.lit(0)).bitwiseAND(F.col("_bit")) != 0),
        )
        .groupBy("_item")
        .agg(F.min("_hit").alias(flag_col))
    )
    return batch.join(
        hits.withColumnRenamed("_item", col), col, "left"
    ).withColumn(flag_col, F.coalesce(flag_col, F.lit(False)))


def filter_definitely_new(
    batch: DataFrame,
    bloom: DataFrame,
    col: str,
    m_bits: int,
    k: int = 5,
    salt: str = "bloom-v2",
) -> DataFrame:
    """Rows whose membership probe MISSES — guaranteed not yet inserted
    (no false negatives). The ingestion-prefilter form: pass these
    straight through; route the ``might_contain`` remainder to the exact
    store check (streaming/doc_dedup.py), which now only scans for the
    designed false-positive fraction of the batch."""
    flagged = bloom_might_contain(batch, bloom, col, m_bits, k, salt)
    return flagged.filter(~F.col("might_contain")).drop("might_contain")


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    fpr: float = 0.01,
    how: str = "inner",
) -> DataFrame:
    """Shuffle-reducing join: a Bloom filter of the SMALL side's keys
    prunes the BIG side before the join shuffle — the explicit form of
    Spark's runtime row-level bloom pushdown, usable where the optimizer
    won't inject one (non-equi plans, pre-aggregated sides, persisted
    filters via bloom_save/load).

    Result is IDENTICAL to the plain join: the filter has no false
    negatives (no matching row is dropped) and the exact join removes
    the false positives. Only ``inner`` and ``left_semi`` are accepted —
    an outer/left join must keep non-matching big rows, which is exactly
    what the prefilter removes.

    Scale: when selectivity is low (the usual reason a 100 TB fact table
    joins a bounded dim), the join shuffle carries only the
    maybe-matching fraction (true matches + the designed ``fpr`` of the
    rest) instead of the whole fact table; the filter itself is the
    bounded word table (<= m/64 rows), built with one small-side pass."""
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/left_semi, not {how!r} "
            "(outer joins must keep the rows the prefilter removes)"
        )
    keys = small.select(F.col(small_key)).distinct()
    n = keys.count()  # bounded driver scalar (small side by assumption)
    if n == 0:
        return big.join(
            small, big[big_key] == small[small_key], how
        )  # empty small side: plain join returns empty anyway
    m_bits, k = bloom_params(n, fpr)
    bloom = bloom_build(keys, small_key, m_bits, k)
    pruned = (
        bloom_might_contain(big, bloom, big_key, m_bits, k)
        .filter(F.col("might_contain"))
        .drop("might_contain")
    )
    return pruned.join(small, pruned[big_key] == small[small_key], how)
