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

from ..checkpoint import pin

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


def shingle_rows(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Word n-gram shingles, one row per (doc, position) — WITHIN-DOC
    DUPLICATES INCLUDED. The whole construction is codegen-friendly: an
    exploded position ``sequence`` plus ``concat_ws(try_element_at(...))``
    per output row, no interpreted higher-order functions (the round-1
    ``transform(sequence, s -> array_join(slice(...)))`` form ran in the
    expression interpreter and dominated the dedup-family CPU profile).

    Duplicate-insensitive consumers (MinHash: ``min`` ignores repeats) use
    this directly with no dedup pass at all; set-semantics consumers go
    through :func:`doc_shingle_sets` (one ``collect_set``) or
    :func:`word_shingles` (``distinct()``)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    # a document corpus often arrives as few large files -> few partitions;
    # the shingle construction and hashing are the CPU-heavy map work, so
    # spread docs across the cluster first (tiny shuffle of raw docs)
    docs = _spread(docs, id_col)
    # Materialize the word array in its own projection BELOW the explode:
    # selecting words and explode(positions) in ONE select puts the split
    # expression in the Project ABOVE the Generate, re-running
    # regexp_replace+lower+split once per POSITION row (~n_words x per doc,
    # measured ~25% of the minhash headline query and its whole run-to-run
    # variance). With the boundary, split runs once per doc and the Generate
    # replicates only the materialized array attribute.
    with_words = docs.select(F.col(id_col).alias("doc_id"), words.alias("w"))
    # greatest(..., 1): a doc with fewer than n words yields one truncated
    # shingle (mirrors the oracle's greatest(len(w)-(n-1), 1)); try_element_at
    # past the end returns NULL and concat_ws skips NULLs, reproducing the
    # truncated array_join(slice(...)) exactly.
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(F.col("w")) - F.lit(n - 1), F.lit(1))
    )
    shingle = F.concat_ws(
        " ", *[F.try_element_at("w", F.col("pos") + F.lit(i)) for i in range(n)]
    )
    return with_words.select("doc_id", "w", F.explode(starts).alias("pos")).select(
        "doc_id", shingle.alias("shingle")
    )


def doc_shingle_sets(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document DISTINCT word n-gram shingle set: (doc_id, shingles
    array<string>), built as ``collect_set`` over :func:`shingle_rows` —
    one shuffle with map-side partial aggregation (the within-doc dedup
    happens in the map-side hash set, so the exchange carries near-distinct
    data). The Aggregate is also a projection-collapse barrier: downstream
    ``size``/``explode`` references read the materialized array attribute
    instead of re-evaluating the construction expression."""
    return (
        shingle_rows(docs, n, text_col, id_col)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shingles"))
    )


def word_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle) — the
    set-semantics exploded view of :func:`shingle_rows`."""
    return shingle_rows(docs, n, text_col, id_col).distinct()


def _spread(docs: DataFrame, id_col: str) -> DataFrame:
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target, F.col(id_col))
    return docs


def shingle_jaccard_pairs(
    shingles: DataFrame,
    min_jaccard: float = 0.8,
    materialize: bool = True,
    df_cap: int | None = None,
) -> DataFrame:
    """Pairwise Jaccard similarity via the inverted index: join docs sharing a
    shingle, count intersections, then J = |A∩B| / (|A|+|B|-|A∩B|).

    ``df_cap`` is the document-frequency cap — the scale guard: a stop-phrase
    shingle shared by d docs expands to C(d,2) pairs, so shingles with more
    than df_cap postings are dropped from the inverted index, bounding any
    posting list's expansion at C(df_cap, 2).

    Capped SEMANTICS (r3, ADVICE fix): with a cap set, the per-doc set sizes
    are computed over the SAME df-filtered vocabulary as the intersections,
    so the reported value is the exact Jaccard of the restricted shingle
    sets — numerator and denominator consistent (the previous form kept full
    set sizes, silently underestimating J for pairs sharing capped shingles).
    The cap is still RECALL-LOSSY by nature: a pair whose shared shingles are
    ALL high-df (templated docs) generates no candidate at all — that is the
    price of bounding the worst posting list, and why the cap defaults to
    None (exact, oracle-matched) and is opt-in for web-scale corpora. Use
    ``capped_shingle_count`` to log how many shingles a cap drops.
    """
    if materialize:
        # both the per-doc counts and the inverted index scan the shingle
        # set; materialize it once instead of recomputing the explode+distinct
        shingles = shingles.transform(pin, eager=True)
    # inverted index: docs per shingle, then in-list pair expansion — one
    # aggregation instead of a two-sided self-join shuffle; df_cap bounds the
    # in-list expansion of any single posting list.
    index = shingles.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    if df_cap is not None:
        index = index.filter(F.size("ids") <= df_cap)
        # restricted-vocabulary set sizes: recount per doc AFTER the df
        # filter (df=1 shingles included — they are part of the union)
        counts = (
            index.select(F.explode("ids").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"))
        )
    else:
        counts = shingles.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_shingles")
        )
    by_shingle = index.filter(F.size("ids") > 1)
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        by_shingle.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
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


def jaccard_pairs_from_sets(
    sets: DataFrame,
    min_jaccard: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact-Jaccard near-dup pairs from :func:`doc_shingle_sets` output —
    the minimum-shuffle plan (3 exchanges total vs 6 for the exploded-input
    path): per-doc shingle counts are ``size(shingles)`` computed from the
    aggregated array attribute and THREADED THROUGH the inverted-index
    postings, so the final Jaccard needs no count-table joins at all.

    The count-threading is only valid when every shingle counts, so with a
    ``df_cap`` set this delegates to :func:`shingle_jaccard_pairs`, whose
    capped path recounts set sizes over the df-filtered vocabulary
    (consistent restricted-vocabulary Jaccard — see its docstring)."""
    if df_cap is not None:
        exploded = sets.select("doc_id", F.explode("shingles").alias("shingle"))
        return shingle_jaccard_pairs(
            exploded, min_jaccard, materialize=False, df_cap=df_cap
        )
    posts = sets.select(
        "doc_id",
        F.size("shingles").alias("n"),
        F.explode("shingles").alias("shingle"),
    )
    # postings carry (doc_id, n_shingles); struct sort orders by doc_id
    # (unique within a posting list), preserving the doc_a < doc_b contract
    by_shingle = (
        posts.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x.doc_id AS doc_a, x.n AS n_a, y.doc_id AS doc_b, y.n AS n_b))))"
    )
    # LOSSLESS length filter before the pair shuffle: J = c/(n_a+n_b-c) is
    # increasing in c and c <= min(n_a, n_b), so a pair can only reach the
    # threshold if min/(n_a+n_b-min) >= tau. Evaluated in the SAME double
    # division as the final filter (rounding is monotone, so the float
    # bound dominates the float J — no epsilon needed; a naive
    # `min >= tau*max` float form DROPS exact-boundary pairs like
    # n=(4,5) at tau=0.8). Measured at sf0.1: prunes 63% of pair rows
    # (1.27M -> 469k) ahead of the (doc_a, doc_b) exchange.
    _min_n = F.least(F.col("p.n_a"), F.col("p.n_b"))
    _jmax = _min_n.cast("double") / (
        F.col("p.n_a") + F.col("p.n_b") - _min_n
    )
    inter = (
        by_shingle.select(F.explode(pair_expr).alias("p"))
        .filter(_jmax >= F.lit(min_jaccard))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            # n_a/n_b are functionally determined by doc_a/doc_b; min() is a
            # deterministic any_value
            F.min("p.n_a").alias("n_a"),
            F.min("p.n_b").alias("n_b"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return inter.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= min_jaccard
    )


MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic affine universal-hash parameters (a_i, b_i), identical
    constants on the oracle side. Multipliers must be large (order ~P) so the
    k permutations decorrelate — with small a_i the argmin shingle is shared
    across permutations and LSH buckets collapse."""
    rng_a = 1103515245  # classic LCG constants as a reproducible source
    rng_c = 12345
    params = []
    x = 42
    for _ in range(k):
        x = (rng_a * x + rng_c) % (1 << 31)
        a = (x | 1) % MINHASH_P or 1  # odd, in [1, P)
        x = (rng_a * x + rng_c) % (1 << 31)
        b = x % MINHASH_P
        params.append((a, b))
    return params


def minhash_signatures(shingles: DataFrame, k: int = 8) -> DataFrame:
    """k-permutation MinHash signature per document as columns mh0..mh{k-1}.

    One md5-derived base hash per shingle (projected ONCE before the
    aggregation — inlining it into the k agg expressions would re-hash every
    row k times), then k affine universal-hash transforms
    ``(base % P) * a_i + b_i mod P`` (Carter-Wegman family); each permutation
    is a map-side min-aggregation: a single groupBy(doc_id) shuffle total.
    ``min`` is duplicate-insensitive, so the input does NOT need set
    semantics — feed :func:`shingle_rows` directly, no dedup pass.
    Operands stay < 2^62, so int64 arithmetic is exact in both engines."""
    hashed = shingles.select(
        "doc_id", (portable_hash64(F.col("shingle")) % F.lit(MINHASH_P)).alias("h")
    )
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_band_buckets(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket key ->
    (doc_id, band, bucket). Docs sharing (band, bucket) are candidates.
    P[candidate] = 1-(1-J^rows)^bands — with 4x2 the curve crosses 0.5 near
    J≈0.5, tuned for the 0.8-Jaccard planted dups."""
    entries = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{band * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for band in range(bands)
        ]
    )
    # single pass: one array-of-structs projection + explode, instead of a
    # bands-way union that would recompute the signature pipeline per band
    return signatures.select("doc_id", F.explode(entries).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket")
    )


def minhash_candidate_pairs(
    buckets: DataFrame, max_bucket_size: int | None = 10000
) -> DataFrame:
    """Distinct candidate pairs from shared LSH buckets.

    Implemented as groupBy(bucket) + in-bucket pair expansion with array
    expressions rather than a self-join: one aggregation instead of two full
    recomputations of the signature pipeline, and no join shuffle. Buckets
    are tiny by construction (banding spreads docs over 2^k x bands keys),
    but a mis-tuned banding or a degenerate corpus (many identical docs) can
    produce a mega-bucket whose C(d,2) expansion stalls one task —
    ``max_bucket_size`` drops such buckets, bounding any task at
    C(max_bucket_size, 2) pairs. Use ``capped_bucket_count`` for a drop
    count."""
    groups = (
        buckets.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket_size is not None:
        groups = groups.filter(F.size("ids") <= max_bucket_size)
    pairs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        groups.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
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
        _spread(docs, id_col)
        .select(F.col(id_col).alias("doc_id"), F.explode(words).alias("word"))
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


def capped_shingle_count(shingles: DataFrame, df_cap: int) -> int:
    """How many shingles the document-frequency cap drops — run once after a
    dedup pass to log coverage loss (a separate tiny job, deliberately not in
    the hot path)."""
    return (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .count()
    )


def capped_bucket_count(buckets: DataFrame, max_bucket_size: int) -> int:
    """How many LSH buckets the size guard drops (see minhash_candidate_pairs)."""
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket_size)
        .count()
    )


def simhash_near_dup_pairs(
    fingerprints: DataFrame,
    max_bits: int = 3,
    bits: int = 60,
    max_bucket_size: int | None = 10000,
) -> DataFrame:
    """Near-duplicate pairs from SimHash fingerprints: all (doc_a, doc_b,
    hamming) with Hamming distance <= max_bits — the retrieval half of the
    SimHash family (Charikar '02; block technique per Manku et al. '07).

    NOT all-pairs: the fingerprint is split into ``max_bits + 1`` bit blocks;
    by pigeonhole, any pair within max_bits bits agrees exactly on at least
    one block, so candidates are generated by bucketing on (block index,
    block value) and only candidates are XOR-verified. Cost is one explode
    (b rows per doc), one groupBy on uniform block keys, and an exact
    bit_count filter — sub-quadratic at any corpus size, with the same
    in-bucket expansion guard as the MinHash path (identical fingerprints,
    e.g. empty docs, would otherwise form one mega-bucket).
    """
    n_blocks = max_bits + 1
    width = bits // n_blocks  # 60 bits / 4 blocks -> 15-bit block keys
    mask = (1 << width) - 1
    block = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("block")
    keyed = fingerprints.select("doc_id", "simhash", block).select(
        "doc_id",
        "simhash",
        "block",
        F.expr(f"shiftright(simhash, cast({width} * block AS int)) & {mask}").alias(
            "val"
        ),
    )
    groups = (
        keyed.groupBy("block", "val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc_id").alias("id"), F.col("simhash").alias("h")))
            ).alias("entries")
        )
        .filter(F.size("entries") > 1)
    )
    if max_bucket_size is not None:
        groups = groups.filter(F.size("entries") <= max_bucket_size)
    pair_expr = F.expr(
        "flatten(transform(entries, (x, i) -> "
        "transform(slice(entries, i + 2, size(entries)), y -> "
        "struct(x.id AS doc_a, y.id AS doc_b, x.h AS ha, y.h AS hb))))"
    )
    cands = (
        groups.select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.ha", "p.hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return (
        cands.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_bits)
    )


def duplication_density(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplication density — the graded signal between
    exact-duplicate and unique: (id, n_ngrams, n_duplicated, dup_density)
    where ``dup_density`` is the fraction of the document's DISTINCT word
    n-grams that also occur in at least one OTHER document. An exact
    clone scores 1.0, boilerplate-heavy pages score high, genuinely
    novel text scores ~0; the corpus-wide analogue of the WITHIN-doc
    repetition battery (operators/quality.py), and a natural
    attribute-store column (operators/attributes.py).

    Plan: distinct shingles (one uniform-key aggregation) -> per-shingle
    document frequency (second uniform-key aggregation) -> per-doc
    fraction (third). A shingle counts as duplicated for a document when
    its df >= 2 — within-doc repeats never inflate it (set semantics).
    Documents shorter than ``n`` tokens follow the house shingle rule
    (one truncated shingle — shingle_rows), so two short clones still
    score 1.0; null/empty/whitespace-only documents all carry the same
    single empty shingle and therefore score 1.0 whenever the corpus has
    two or more of them — degenerate documents ARE duplicates of each
    other. Only documents absent from the shingle table (none, under
    these conventions) report 0 over 0 via the id-spine join."""
    sh = word_shingles(docs, n, text_col, id_col)
    df_tab = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        sh.join(df_tab, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("_df") >= 2).cast("long")).alias("n_duplicated"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("doc_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_duplicated", F.lit(0)).alias("n_duplicated"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.col("n_duplicated") / F.col("n_ngrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_density"),
        )
    )
