"""Vector-similarity search over embedding columns.

The reference's cone cross-match IS a cosine-similarity threshold scan
(``DIA.py:72-77``: ``numpy.inner(pointing_xyz, vars) > cos(open_angle/2)`` —
SURVEY.md J1); these operators generalize it from 3-d unit vectors to
arbitrary-dimension embeddings:

* brute-force top-k: crossJoin(queries x corpus) with a fold-based dot
  product + per-query window. Exact; the baseline. At scale the queries side
  is broadcast, so the corpus is scanned once with no shuffle until top-k.
* sign-LSH bucketed (:func:`lsh_bucketed_topk`): single-table coarse
  quantization by the sign pattern of leading dimensions — the TEACHING
  baseline (recall 0.11 on the bench embeddings; kept for the robustness
  battery and as the simplest bucket-join shape).
* multi-table OR-amplified multi-probe LSH (:func:`multitable_lsh_topk`):
  the production LSH ANN — L tables of diagonal sign-hyperplanes, queries
  probe every bucket within Hamming distance 2, candidates de-duplicated
  then exact-cosine re-ranked. Recall 0.82 at the bench shape at a ~25%
  candidate fraction.
* IVF-Flat / IVF-PQ (here + operators/pq.py): the recommended scale paths
  when the data has cluster structure.

Dot products are computed as an ordered left fold in double precision so the
DuckDB oracle (list_dot_product over DOUBLE[]) produces bit-identical sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread

#: Single source of truth for the approximate-ANN recall floors: the bench
#: (bench.py recall gate) and the pytest pins import THESE values, so the
#: two can never drift (r6 verdict item 6). Each floor sits under the
#: measured sf0.1 bench-shape recall with real headroom:
#: multitable LSH 0.82 measured -> 0.6 floor; IVF 0.86 -> 0.6;
#: IVF-PQ 0.78 at refine=8 -> 0.6; quantized re-rank 1.0 -> 0.95.
RECALL_FLOORS = {
    "ann_topk_lsh": 0.6,
    "ann_topk_ivf": 0.6,
    "ivf_pq_topk": 0.6,
    "quantized_topk": 0.95,
    # 1-bit sign signatures: 0.91 measured at the sf0.1 bench shape with
    # refine=16 and the asymmetric int8-query x sign-pattern pre-filter
    # (r10; symmetric Hamming measured 0.67 at the same 80-candidate
    # budget). Still the coarse end of the quantization family (32x less
    # candidate-scan I/O than float32, 8x less than int8); floor 0.8
    # under the measurement with real headroom.
    "hamming_topk": 0.8,
}

#: Query-set spec for each registered approximate query: vectors with
#: ``vec_id < N`` are the queries. bench.py scopes the EXACT result by
#: this same predicate (not by the approx output's query ids), so a
#: recall collapse that returns zero rows for some query counts as
#: recall 0 instead of silently dropping out of the mean (r6 advice 1).
RECALL_QUERY_MAX_ID = {
    "ann_topk_lsh": 20,
    "ann_topk_ivf": 20,
    "ivf_pq_topk": 10,
    "quantized_topk": 20,
    "hamming_topk": 20,
}

#: Ceiling on the multitable-LSH candidate fraction (distinct candidate
#: pairs / (|Q| * (|C|-1))) at the bench shape — the honesty partner of
#: the recall floor: recall alone could be "fixed" by probing until the
#: bucket join degenerates to a full scan, so the bench raises if the
#: fraction crosses this. Measured 0.255 at sf0.1 with the registered
#: parameters; ceiling leaves drift headroom while staying far from 1.0.
LSH_CANDIDATE_FRACTION_CEILING = 0.5


def dot_fold(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product in double precision (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _let(value: Column, body) -> Column:
    """Single-evaluation let-binding in expression land (the same helper
    rerank.py documents): bind ``value`` through a one-element ``transform``
    so ``body`` references ONE evaluation — the expression interpreter has
    no common-subexpression elimination, so an O(dim) score referenced
    twice inside a fold lambda would otherwise be computed twice per
    element."""
    return F.element_at(F.transform(F.array(value), body), 1)


def dot_chain(a: Column, b: Column, dim: int) -> Column:
    """Dot product as a left-associated multiply-add CHAIN for a known
    dimension: ``((0 + a1*b1) + a2*b2) + ...`` — the exact IEEE association
    of :func:`dot_fold`, so results are bit-identical, but built from plain
    expressions that whole-stage codegen compiles (higher-order functions
    like ``aggregate``/``zip_with`` run in the expression interpreter, which
    dominates CPU when the dot product sits inside a pair join)."""
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
            "double"
        )
    return acc


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Deterministic dot product; pass ``dim`` when the embedding width is
    known (fixed-width corpus) to stay inside codegen."""
    return dot_chain(a, b, dim) if dim is not None else dot_fold(a, b)


def l2_norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Raw cosine — callers must exclude zero-norm/NaN vectors first (as
    brute_force_topk's side filters do) or use :func:`safe_cosine`."""
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def safe_cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """cosine(a, b), NULL for degenerate inputs — the expression-form
    counterpart of brute_force_topk's row filters, for call sites that
    must keep the row (e.g. mmr_rerank's survivor updates). Zero-norm /
    NULL vectors make the norm product non-positive (or NULL), NaN
    components make it NaN — both gated BEFORE the division so ANSI mode
    never sees 0/0; a residual NaN ratio (inf components) maps to NULL."""
    np_ = l2_norm(a, dim) * l2_norm(b, dim)
    sim = F.when((np_ > 0) & ~F.isnan(np_), dot(a, b, dim) / np_)
    return F.when(~F.isnan(F.coalesce(sim, F.lit(0.0))), sim)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected to be small (it is broadcast); the corpus side is
    scanned once per partition — no shuffle until the per-query top-k
    window. Norms are precomputed per SIDE (once per query / corpus row)
    instead of per pair, and the corpus is spread to cluster parallelism
    first — a small corpus parquet arrives as one split, which would put
    the whole pair loop on a single core of the broadcast join."""
    corpus = _spread(corpus, id_col)
    # degenerate-vector guard: cosine is undefined for zero-norm vectors
    # and ANSI mode turns the division into a hard error; `norm > 0`
    # rejects NULL vectors, and the explicit ~isnan rejects NaN
    # components — Spark orders NaN GREATER than every number, so
    # `NaN > 0` is true and an unguarded NaN similarity would sort
    # FIRST in every desc ranking
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col), dim).alias("qn"),
    ).filter((F.col("qn") > 0) & ~F.isnan("qn"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col), dim).alias("cn"),
    ).filter((F.col("cn") > 0) & ~F.isnan("cn"))
    sim = F.round(
        dot(F.col("qvec"), F.col("cvec"), dim) / (F.col("qn") * F.col("cn")),
        round_digits,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def exact_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
    dim: int | None = None,
    n_queries: int | None = None,
    arrow_min_work: int = 6000,
) -> DataFrame:
    """Front door for exact cosine top-k: dispatches between the
    expression-fold :func:`brute_force_topk` and the Arrow/BLAS
    :func:`arrow_topk` on the per-corpus-row work product ``dim x |Q|``
    — the quantity both engines' costs actually scale with (the fold
    pays it in generated JVM expression code per pair; arrow pays a flat
    Arrow serialization per row plus one BLAS block whose flops barely
    move it). Composed paths (MMR candidate generation, ad-hoc recall
    baselines) call this so wide-embedding corpora get the BLAS path
    without every caller re-learning the crossover.

    MEASURED rule basis (local[32]; PERFORMANCE.md driver r10/r11):
    dim 64 x 20 queries (work 1280) — fold 0.49-0.72 s vs arrow
    0.65-0.76 s (fold wins; the bench/registered narrow shape);
    dim 512 x 20 (10240) — arrow 2.7x; dim 512 x 100 (51200) — arrow
    14.7x; dim 64 x 1000 (64000) — fold 1.04 s vs arrow 0.62 s;
    dim 128 x 200 (25600) — arrow 0.59 vs 0.71 s. The default threshold
    6000 puts every measured arrow-win above it and the measured fold
    win below; it is host-dependent in the tie region (both paths are
    within ~1.3x there), so callers with a profiled shape can override.

    ``dim`` and ``n_queries`` skip the probes when the caller knows
    them; otherwise one corpus row is peeked for dim and the (bounded,
    broadcast-sized by contract) query frame is counted — driver-side
    scalars, same class as the day-literal collects. Results of the two
    paths agree to ``round_digits`` rounding (BLAS accumulation order
    differs from the ordered fold; parity pinned by test at dim 64 and
    dim 512)."""
    if dim is None:
        row = (
            corpus.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        dim = int(row.d) if row is not None else 0
    if n_queries is None:
        n_queries = queries.count()
    if dim * n_queries >= arrow_min_work:
        return arrow_topk(corpus, queries, k, vec_col, id_col, round_digits)
    # the probed dim is for DISPATCH only — forwarding it would switch
    # brute_force_topk's dot from the fold to the unrolled chain, which
    # measured SLOWER at this narrow shape (0.95 -> 2.5 s at dim 64 x 20
    # queries x 5k corpus) and whose float accumulation order differs
    # (a caller-visible value change at the rounding margin)
    return brute_force_topk(corpus, queries, k, vec_col, id_col, round_digits)


def sign_lsh_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Deterministic sign-pattern bucket from the leading n_bits dimensions:
    bucket = sum(2^i * (v[i] > 0)). Axis-aligned random-hyperplane LSH."""
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(vec, i + 1).cast("double") > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket


def ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Train an IVF coarse quantizer (k-means on the corpus) and return
    (assigned_corpus, model): the corpus with a ``cluster`` column plus the
    fitted model for assigning queries. MLlib KMeans is the distributed
    trainer; at 100 TB train on a sample and broadcast the centroids."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="_features", predictionCol="cluster"
    ).fit(vecs)
    assigned = model.transform(vecs).drop("_features")
    return assigned, model


def centroid_score(qvec: Column, cvec: Column, dim: int | None = None) -> Column:
    """Centroid-affinity score: ``2*dot(q,c) - dot(c,c)``. Ranking centroids
    by this descending is identical to ranking by L2 distance ascending
    (``|q-c|^2 = |q|^2 - score``, and |q|^2 is constant per query) but is
    built from the two ordered-fold dot products the DuckDB oracle reproduces
    bit-for-bit (list_dot_product) — so centroid assignment is
    engine-deterministic, unlike a float subtract-square-sum."""
    return F.lit(2.0) * dot(qvec, cvec, dim) - dot(cvec, cvec, dim)


def _nearest_centroids(
    vecs: DataFrame,
    centroids: DataFrame,
    n: int,
    id_alias: str,
    dim: int | None = None,
) -> DataFrame:
    """Top-n centroids per vector by centroid_score — a broadcast of the
    (tiny) centroid table against the vector set. Runs cluster-side: no
    driver collect, works for arbitrarily large vector sets (corpus
    assignment uses n=1, query probing n=n_probe).

    The n=1 corpus assignment is a ZERO-SHUFFLE per-row argmax (r15): the
    centroids are nested into one broadcast row and each vector folds over
    them in cluster-ascending order keeping the strictly-best score — the
    exact ``max_by(struct(score, -cluster))`` pick (highest score, ties to
    the lowest cluster), same ``centroid_score`` expression, so winners
    are bit-identical (oracle-pinned by semdedup_drops / ivf_pq_topk /
    ann_topk_ivf). The previous max_by groupBy partial-aggregated
    map-side but still EXCHANGED one row per vector — embedding payload
    included — and planned as a SortAggregate over an array-typed buffer,
    i.e. a full-corpus shuffle + sort at scale for a per-row reduction
    (guide §2.4). Precondition, as for the PQ encode fold: vectors are
    finite and non-null (a NaN score ranks first under the aggregate's
    ordering but loses every ``>`` comparison)."""
    if n == 1:
        ctype = centroids.schema["cluster"].dataType
        nested = centroids.groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cluster"), F.col("_cvec")))
            ).alias("_cents")
        )
        pick = F.aggregate(
            F.col("_cents"),
            F.struct(
                F.lit(None).cast(ctype).alias("cluster"),
                F.lit(float("-inf")).alias("s"),
            ),
            lambda acc, e: _let(
                centroid_score(F.col("_v"), e["_cvec"], dim),
                lambda s: F.when(
                    s > acc["s"],
                    F.struct(e["cluster"].alias("cluster"), s.alias("s")),
                ).otherwise(acc),
            ),
            lambda acc: acc["cluster"],
        )
        return (
            _spread(vecs, "_vid")
            .crossJoin(F.broadcast(nested))
            .select(
                F.col("_vid").alias(id_alias), F.col("_v"), pick.alias("cluster")
            )
        )
    scored = _spread(vecs, "_vid").crossJoin(F.broadcast(centroids)).select(
        F.col("_vid").alias(id_alias),
        F.col("_v"),
        F.col("cluster"),
        centroid_score(F.col("_v"), F.col("_cvec"), dim).alias("_cscore"),
    )
    w = Window.partitionBy(id_alias).orderBy(F.desc("_cscore"), F.asc("cluster"))
    return (
        scored.withColumn("_crn", F.row_number().over(w))
        .filter(F.col("_crn") <= n)
        .drop("_cscore", "_crn")
    )


def ivf_topk_with_centroids(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """IVF-Flat top-k given an explicit centroid table
    (``cluster int, centroid array``): assign each corpus vector to its
    nearest centroid, probe the ``n_probe`` nearest centroids per query, and
    score only the probed clusters — the inverted-file ANN pattern with the
    corpus pruned to ~n_probe/n_clusters.

    Everything is cluster-side: the centroid table is broadcast to both the
    assignment join and the probe join; there is no driver-side collect, so
    the query side may be any size. Determinism: centroid_score + integer
    tie-breaks make assignment/probing/top-k reproducible in the DuckDB
    oracle."""
    cent = centroids.select(
        F.col("cluster").cast("int").alias("cluster"), F.col("centroid").alias("_cvec")
    )
    assigned = _nearest_centroids(
        corpus.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")),
        cent,
        n=1,
        id_alias="neighbor_id",
        dim=dim,
    ).select(
        "neighbor_id",
        F.col("_v").alias("cvec"),
        l2_norm(F.col("_v"), dim).alias("cn"),
        "cluster",
    ).filter((F.col("cn") > 0) & ~F.isnan("cn"))  # degenerate-vector guard (see brute_force_topk)
    probes = _nearest_centroids(
        queries.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")),
        cent,
        n=n_probe,
        id_alias="query_id",
        dim=dim,
    ).select(
        "query_id",
        F.col("_v").alias("qvec"),
        l2_norm(F.col("_v"), dim).alias("qn"),
        "cluster",
    ).filter((F.col("qn") > 0) & ~F.isnan("qn"))
    sim = F.round(
        dot(F.col("qvec"), F.col("cvec"), dim) / (F.col("qn") * F.col("cn")), 9
    )
    scored = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a (query, neighbor) pair can only repeat if the corpus vector were
        # assigned to 2 clusters — n=1 assignment makes pairs unique already
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k with a KMeans-trained coarse quantizer: train on
    the corpus (MLlib, distributed), then delegate to the cluster-side
    fixed-centroid path — the trained centroids become the broadcast centroid
    table; no driver-side probing."""
    _assigned, model = ivf_index(corpus, n_clusters, vec_col, seed)
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )
    return ivf_topk_with_centroids(
        corpus, queries, centroids, k=k, n_probe=n_probe, vec_col=vec_col, id_col=id_col
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket (expected 1/2^n_bits of the corpus scanned per query). The
    bucket equi-join replaces the cross join — at 100 TB this is the
    difference between a full scan per query and a pruned hash-join."""
    corpus = _spread(corpus, id_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col), dim).alias("qn"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    ).filter((F.col("qn") > 0) & ~F.isnan("qn"))  # degenerate-vector guard (see brute_force_topk)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col), dim).alias("cn"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    ).filter((F.col("cn") > 0) & ~F.isnan("cn"))
    sim = F.round(
        dot(F.col("qvec"), F.col("cvec"), dim) / (F.col("qn") * F.col("cn")),
        round_digits,
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k)


def _pair_hyperplane_bucket(
    vec: Column, table: int, n_bits: int, dim: int
) -> Column:
    """Bucket of one LSH table: ``n_bits`` deterministic DIAGONAL
    hyperplanes, bit i = (v[p] - v[q] > 0) with p = (table*n_bits + i) mod
    dim and q = (p + 1 + table) mod dim. The per-table stride (1 + table)
    keeps tables distinct even when table*n_bits wraps past dim, so L can
    exceed dim/n_bits — the axis-aligned single-table form
    (:func:`sign_lsh_bucket`) tops out at dim/n_bits independent tables
    and, measured on the bench embeddings, at recall 0.11. Pure integer
    column algebra; float->double casts are exact so DuckDB reproduces
    every bit."""
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        p = (table * n_bits + i) % dim
        q = (p + 1 + table) % dim
        # F.get (0-based, NULL out of range) rather than element_at: a
        # shorter-than-dim vector must hash to SOME bucket (NULL
        # comparison -> bit 0, matching DuckDB's list-index semantics),
        # not throw under ANSI mode — degenerate vectors are excluded at
        # the re-rank's norm guard, not here
        bit = F.when(
            (F.get(vec, p).cast("double") - F.get(vec, q).cast("double")) > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit * F.lit(1 << i)
    return bucket


def multiprobe_masks(n_bits: int, multiprobe: int) -> list[int]:
    """XOR masks for multi-probe LSH: the query probes its own bucket plus
    every bucket within Hamming distance ``multiprobe`` (0, 1, or 2 bit
    flips) — 1 + n_bits + C(n_bits, 2) probes at multiprobe=2. Probing
    near buckets recovers neighbors that straddle a hyperplane, the
    standard recall amplifier that costs extra PROBES (tiny query-side
    explode) instead of extra TABLES (corpus-side explode) [Lv et al.,
    Multi-probe LSH, VLDB 2007]."""
    masks = [0]
    if multiprobe >= 1:
        masks += [1 << j for j in range(n_bits)]
    if multiprobe >= 2:
        masks += [
            (1 << j) | (1 << j2)
            for j in range(n_bits)
            for j2 in range(j + 1, n_bits)
        ]
    return masks


def multitable_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 12,
    n_tables: int = 12,
    multiprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
    dim: int = 64,
    broadcast_queries: bool = True,
    _candidates_only: bool = False,
) -> DataFrame:
    """OR-amplified multi-probe sign-LSH top-k — the production LSH ANN
    (the single-table :func:`lsh_bucketed_topk` is the teaching baseline;
    its recall on the bench embeddings is 0.11 vs 0.82 here at a ~25%
    candidate fraction).

    Shape: the corpus explodes to ``n_tables`` (table, bucket) rows; each
    query explodes to ``n_tables * len(multiprobe_masks)`` (table, probe)
    rows; one (table, bucket) equi-join generates candidates, which are
    de-duplicated to distinct (query, neighbor) pairs BEFORE scoring so
    the exact-cosine re-rank pays each pair once no matter how many
    tables it collided in. At 100 TB: no cross join anywhere, the probe
    side broadcasts by default (it is |Q|*L*probes id+bucket rows,
    vectors NOT carried through the explode — right for the family's
    driver-small query-set contract, same as brute_force_topk), and
    candidates are the only shuffled set, sub-linear in the corpus
    (bucket fraction ~ L*probes/2^b); the re-rank joins candidates back
    to the two vector scans. Multi-probe multiplies the probe side by
    1+b+C(b,2) (~79 rows per query-table at the defaults), so for
    query-at-scale workloads (millions of queries) pass
    ``broadcast_queries=False`` — the probe and re-rank joins then
    shuffle on their keys under AQE instead of forcing a data-dependent
    broadcast.

    Defaults (12 bits x 12 tables x 2-bit multiprobe) are tuned on the
    bench embeddings (64-d, near-uniform unit vectors — the LSH-hard
    case): recall 0.82 at sf0.1 / 0.70 at sf0.01 against exact top-5,
    candidate fraction ~0.25. All arithmetic is integer or exact-cast
    double, so the DuckDB oracle replays assignment, probing, candidate
    set, and ranks bit-for-bit."""
    if dim < n_bits:
        raise ValueError(f"dim={dim} must be >= n_bits={n_bits}")
    c = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # the n_tables bucket expressions are projected as named columns FIRST
    # and only then exploded: inside a single generator expression the
    # n_tables*n_bits CASE terms form one generated method that exceeds the
    # JIT limits (measured: codegen compile failure -> interpreted
    # fallback), while a plain projection splits per-expression and stays
    # inside whole-stage codegen
    def _with_buckets(df: DataFrame, vec: str) -> DataFrame:
        return df.withColumns(
            {
                f"_b{t}": _pair_hyperplane_bucket(F.col(vec), t, n_bits, dim)
                for t in range(n_tables)
            }
        )

    table_array = F.array(*[F.col(f"_b{t}") for t in range(n_tables)])
    c_buckets = _with_buckets(c, "cvec").select(
        "neighbor_id", F.posexplode(table_array).alias("tbl", "bucket")
    )
    masks = multiprobe_masks(n_bits, multiprobe)
    q_probes = (
        _with_buckets(q, "qvec")
        .select("query_id", F.posexplode(table_array).alias("tbl", "_qbucket"))
        .select(
            "query_id",
            "tbl",
            F.explode(
                F.array(
                    *[F.col("_qbucket").bitwiseXOR(F.lit(m)) for m in masks]
                )
            ).alias("bucket"),
        )
    )
    probe_side = F.broadcast(q_probes) if broadcast_queries else q_probes
    cand = (
        c_buckets.join(probe_side, ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    if _candidates_only:
        return cand
    # exact-cosine re-rank of the de-duplicated candidates; norm guards as
    # in brute_force_topk (zero-norm/NaN vectors can be neither query nor
    # neighbor)
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qn"),
    ).filter((F.col("qn") > 0) & ~F.isnan("qn"))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col)).alias("cn"),
    ).filter((F.col("cn") > 0) & ~F.isnan("cn"))
    sim = F.round(
        dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")),
        round_digits,
    )
    scored = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv) if broadcast_queries else qv, "query_id")
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def multitable_lsh_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    n_bits: int = 12,
    n_tables: int = 12,
    multiprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    broadcast_queries: bool = True,
) -> DataFrame:
    """The distinct (query_id, neighbor_id) candidate set
    :func:`multitable_lsh_topk` re-ranks — exposed so the bench can
    record the candidate FRACTION (pairs / (|Q| * (|C|-1))) against
    :data:`LSH_CANDIDATE_FRACTION_CEILING`: recall floors alone could be
    satisfied by probing until the bucket join degenerates to a full
    scan, so the fraction is gated alongside them. One definition — this
    delegates to the top-k builder's own candidate stage."""
    return multitable_lsh_topk(
        corpus,
        queries,
        n_bits=n_bits,
        n_tables=n_tables,
        multiprobe=multiprobe,
        vec_col=vec_col,
        id_col=id_col,
        dim=dim,
        broadcast_queries=broadcast_queries,
        _candidates_only=True,
    )


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """In-engine ANN quality evaluation: per-query recall of an approximate
    top-k result against the exact one — (query_id, n_exact, n_hit,
    recall). The tuning loop for n_probe / n_bits / refine factors runs
    this at full corpus scale instead of collecting both results to the
    driver: one left-semi join keyed on (query, neighbor) + one per-query
    aggregation, both uniform keys.

    Pass any two frames carrying (query_col, neighbor_col) — ivf vs brute,
    quantized vs exact, pq vs flat. Both projections are de-duplicated
    first, so frames with repeated (query, neighbor) rows (a bucketed
    candidate list, say) still count each pair once and recall stays in
    [0, 1]. Mean recall = avg(recall) over the output (one more tiny
    aggregation)."""
    exact_pairs = exact.select(query_col, neighbor_col).distinct()
    hits = approx.select(query_col, neighbor_col).distinct().join(
        exact_pairs, [query_col, neighbor_col], "left_semi"
    )
    n_hit = hits.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_hit"))
    n_exact = exact_pairs.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        n_exact.join(n_hit, query_col, "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
        .withColumn(
            "recall", F.col("n_hit").cast("double") / F.col("n_exact")
        )
    )


def arrow_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
) -> DataFrame:
    """Exact top-k cosine neighbors via Arrow-batched numpy matmul — the
    WIDE-embedding scale path next to :func:`brute_force_topk`.

    The expression-level scorers pay O(dim) per pair in generated (or
    worse, interpreted) JVM code per element; real embedding corpora are
    dim 384-3072, where the arithmetic should be one BLAS ``C @ Q.T``
    per Arrow batch instead. Shape: the (bounded) query matrix is
    normalized once and shipped in the task closure; ``mapInPandas``
    over the corpus computes each batch's cosine block and emits only
    each query's LOCAL top-k per batch (k rows per query per batch —
    the all-pairs frame never materializes and the shuffle carries
    O(batches x |Q| x k) id/score rows, not dim-wide vectors); a final
    per-query window keeps the global top-k. Degenerate vectors (zero
    norm / NaN / NULL, either side) are dropped exactly like
    brute_force_topk's guards.

    MEASURED crossover vs brute_force_topk (PERFORMANCE.md driver r10):
    at the bench shape (2k corpus, dim 64, 20 queries) the fold WINS
    0.49 vs 0.76 s — Arrow serialization overhead isn't repaid on 40k
    pairs, so the registered narrow-dim queries keep the fold. At
    50k x dim 512: 20 queries = fold 2.59 s vs arrow 0.95 s (2.7x);
    100 queries = fold 11.4 s vs arrow 0.77 s (14.7x) — the expression
    cost scales with pairs x dim while the BLAS block barely moves, and
    arrow is near-flat in |Q|. Output schema matches brute_force_topk;
    scores are rounded to ``round_digits`` (BLAS accumulation order
    differs from the ordered fold, so agreement is to rounding, not
    bit-for-bit — ann_recall == 1.0 vs the fold is pinned by test at
    dim 64 and dim 512)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qrows = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .filter(F.col("qv").isNotNull())
        .collect()
    )
    # per-row conversion: a NULL ELEMENT inside a vector (or a wrong-width
    # vector) must drop that query like every degenerate-vector guard in
    # this family, not throw on the driver
    qid_list, qvecs, want_dim = [], [], None
    for r in qrows:
        try:
            v = np.asarray(r.qv, dtype=np.float64)
        except (TypeError, ValueError):
            continue
        if want_dim is None:
            want_dim = v.shape[0]
        if v.shape != (want_dim,):
            continue
        qid_list.append(r.qid)
        qvecs.append(v)
    qids = np.array(qid_list, dtype=np.int64)
    if len(qvecs):
        qm = np.stack(qvecs)
        qn = np.sqrt((qm * qm).sum(axis=1))
        ok = (qn > 0) & np.isfinite(qn)
        qids, qm, qn = qids[ok], qm[ok], qn[ok]
    n_q = len(qids)
    dim = want_dim

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("cosine_sim", T.DoubleType(), False),
        ]
    )

    def score(batches):
        if n_q == 0:
            return
        qt = (qm / qn[:, None]).T  # dim x n_q, normalized once per task
        for pdf in batches:
            ids = pdf["_nid"].to_numpy(dtype=np.int64)
            vecs = list(pdf["_cv"])
            try:
                cm = np.array(vecs, dtype=np.float64)
                if cm.ndim != 2 or cm.shape[1] != dim:
                    raise ValueError
            except (TypeError, ValueError):
                # slow path only when the fast stack fails: NULL elements
                # or wrong-width corpus vectors become zero rows, which
                # the norm mask drops — one bad member costs one row,
                # never the task
                cm = np.zeros((len(vecs), dim), dtype=np.float64)
                for i, v in enumerate(vecs):
                    try:
                        a = np.asarray(v, dtype=np.float64)
                    except (TypeError, ValueError):
                        continue
                    if a.shape == (dim,):
                        cm[i] = a
            cn = np.sqrt((cm * cm).sum(axis=1))
            keep = (cn > 0) & np.isfinite(cn)
            ids, cm, cn = ids[keep], cm[keep], cn[keep]
            if not len(ids):
                continue
            sims = (cm / cn[:, None]) @ qt  # batch x n_q, one BLAS call
            sims[np.isnan(sims)] = -np.inf  # NaN components lose, never win
            local_k = min(k + 1, len(ids))  # +1: self-match removed later
            top = np.argpartition(-sims, local_k - 1, axis=0)[:local_k]
            rows_q = np.repeat(np.arange(n_q), local_k)
            rows_c = top.T.ravel()
            yield pd.DataFrame(
                {
                    "query_id": qids[rows_q],
                    "neighbor_id": ids[rows_c],
                    "cosine_sim": sims[rows_c, rows_q],
                }
            )

    cand = (
        _spread(corpus, id_col)
        .select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_cv"))
        .filter(F.col("_cv").isNotNull())
        .mapInPandas(score, out_schema)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(~F.isnan("cosine_sim") & (F.col("cosine_sim") > float("-inf")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("cosine_sim", F.round("cosine_sim", round_digits))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
