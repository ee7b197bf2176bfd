"""Deduplication operators for a large-scale training-data pipeline.

Four families, all pure DataFrame compositions (no Python UDFs — everything
stays in whole-stage codegen and scales by partitioning on the dedup key):

* exact:   hash-groupBy on normalized text — one shuffle on the 128-bit key.
* n-gram Jaccard: shingle -> inverted-index self-join -> pairwise Jaccard.
  The shingle join is the scale path: pairs are only generated for documents
  sharing at least one shingle (vs O(n^2) brute force).
* MinHash + LSH banding: k min-hashes per doc, banded into buckets; candidate
  pairs are documents sharing a band bucket — the classic sub-quadratic
  near-dup join (Broder '97 / MMDS ch.3).
* SimHash: 60-bit weighted bit-vote fingerprint (Charikar '02); near-dups
  share fingerprints or differ in few bits.

This generalizes the reference's only dedup-adjacent op (distinct shingle
sets / unions, SURVEY.md U1-U2) to the training-data extension required of
this engine. Hashes are md5-derived so the DuckDB oracle reproduces them
bit-for-bit (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def normalize_text(col: Column) -> Column:
    """Lowercase, trim, collapse runs of whitespace — the canonical form both
    exact dedup and shingling operate on."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: md5 of normalized text -> (fingerprint,
    keep_doc_id=min id, n_copies). One shuffle, keyed on the fingerprint —
    uniform by construction, so no skew at any scale."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        docs.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    Built with sequence/transform/slice array expressions — per-row, no
    shuffle; the output is the inverted-index input for Jaccard and MinHash.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(0)))
    shingles = F.transform(starts, lambda s: F.array_join(F.slice(words, s, n), " "))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def shingle_jaccard_pairs(
    shingles: DataFrame, min_jaccard: float = 0.8
) -> DataFrame:
    """Pairwise Jaccard similarity via the inverted index: join docs sharing a
    shingle, count intersections, then J = |A∩B| / (|A|+|B|-|A∩B|).

    Scale notes: the self-join shuffles on `shingle`; a super-common shingle
    (stop-phrase) would be a skew key — at production scale drop shingles with
    document frequency above a cap first (they cannot contribute to
    high-Jaccard pairs anyway when |A| is bounded below).
    """
    counts = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


def minhash_signatures(shingles: DataFrame, k: int = 8) -> DataFrame:
    """k-permutation MinHash signature per document as columns mh0..mh{k-1}.

    Each "permutation" is the salted portable hash; the signature is k
    map-side min-aggregations over the shingle set — a single groupBy(doc_id)
    shuffle regardless of k (partial aggregation makes the map side do the
    mins)."""
    aggs = [
        F.min(portable_hash64(F.col("shingle"), salt=f"{i}:")).alias(f"mh{i}")
        for i in range(k)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_band_buckets(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket key ->
    (doc_id, band, bucket). Docs sharing (band, bucket) are candidates.
    P[candidate] = 1-(1-J^rows)^bands — with 4x2 the curve crosses 0.5 near
    J≈0.5, tuned for the 0.8-Jaccard planted dups."""
    out = []
    for band in range(bands):
        cols = [
            F.col(f"mh{band * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        out.append(
            signatures.select(
                "doc_id",
                F.lit(band).alias("band"),
                F.md5(F.concat_ws(",", *cols)).alias("bucket"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def minhash_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct candidate pairs from shared LSH buckets."""
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 60, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: per word (with frequency weight) take a 60-bit
    hash; each bit votes +freq/-freq; the fingerprint sets bits with positive
    vote. Implemented as explode(words) x explode(bit positions) -> two-level
    aggregation; ~60x row inflation on the intermediate, but all map-side
    until the final groupBy(doc_id)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    freq = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("whash", portable_hash64(F.col("word")))
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    votes = (
        freq.select("doc_id", "freq", "whash", bit)
        .withColumn(
            "vote",
            F.when(
                F.expr("shiftright(whash, cast(bit AS int)) & 1") == 1,
                F.col("freq"),
            ).otherwise(-F.col("freq")),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("vote_sum"))
    )
    bitval = F.when(
        F.col("vote_sum") > 0, F.expr("shiftleft(cast(1 AS bigint), cast(bit AS int))")
    ).otherwise(F.lit(0).cast("long"))
    return votes.groupBy("doc_id").agg(F.sum(bitval).alias("simhash"))
