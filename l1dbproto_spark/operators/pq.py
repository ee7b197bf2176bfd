"""Product quantization (PQ) for vector search at corpus scale.

IVF prunes WHICH vectors a query scans (operators/similarity.py) and int8
cuts scan bytes 4x (operators/quantize.py); PQ is the third standard lever
(Jegou et al., "Product Quantization for Nearest Neighbor Search", IEEE
TPAMI 2011): split each vector into ``m`` subvectors, quantize each against
a per-subspace codebook of ``k_codes`` centroids, and score candidates by
ASYMMETRIC DISTANCE COMPUTATION (ADC) — the query precomputes a small
``m x k_codes`` lookup table of subvector dot products and every corpus
vector is scored with ``m`` table lookups instead of ``dim`` multiplies.
A dim=64 float32 vector compresses to m=8 single-byte codes (32x), which
is what lets a 10^10-vector index fit in cluster memory.

Spark shape: encoding is one broadcast-codebook join + per-(vector,
subspace) argmin — all column algebra; ADC scoring is zero-join per pair
(the per-query LUT is carried as an ``array<array<double>>`` column and
scoring is ``m`` element_at lookups inside codegen). Exact re-rank of the
``k * refine`` survivors mirrors operators/quantize.py.

Codebooks here are DETERMINISTIC (the first ``k_codes`` corpus vectors'
subvectors — the same fixed-quantizer pattern as the IVF oracle), so every
stage is engine-reproducible; a KMeans-trained codebook plugs into the
same plan (tests pin recall, not centroids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..checkpoint import pin

from .similarity import dot_fold, l2_norm


def subvector(vec: Column, j: int, sub_dim: int) -> Column:
    """Subvector j (0-based) of a flat array column: elements
    ``[j*sub_dim + 1, (j+1)*sub_dim]`` (Spark slice is 1-based)."""
    return F.slice(vec, j * sub_dim + 1, sub_dim)


def _sub_dim(dim: int, m: int) -> int:
    """Subspace width, rejecting non-divisible (dim, m) combinations —
    F.slice past the array end would otherwise silently truncate the
    trailing subvectors and codes would quietly ignore tail dimensions."""
    if dim % m:
        raise ValueError(f"dim={dim} must be divisible by m={m} subspaces")
    return dim // m


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic codebooks: subspace j's codebook is the j-th subvector
    of the first ``k_codes`` corpus vectors — (subspace, code, centroid)
    with ``code`` in [0, k_codes). Swap in KMeans-per-subspace centroids for
    production; the plan downstream is identical."""
    sub_dim = _sub_dim(dim, m)
    base = corpus.orderBy(id_col).limit(k_codes).select(
        F.col(id_col).alias("_cb_id"), F.col(vec_col).alias("_cb_vec")
    )
    # WindowExec logs a no-partition WARN here; it is expected and
    # harmless — the frame is already limit(k_codes)-bounded, so the
    # single partition the warning fears IS the plan (a constant
    # partition key would not help: the optimizer folds it away)
    w = Window.orderBy("_cb_id")
    coded = base.withColumn("code", F.row_number().over(w) - 1)
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                subvector(F.col("_cb_vec"), j, sub_dim).alias("centroid"),
            )
            for j in range(m)
        ]
    )
    return coded.select("code", F.explode(subs).alias("s")).select(
        F.col("s.subspace").alias("subspace"), "code", F.col("s.centroid").alias("centroid")
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Encode every vector as ``m`` codes: per subspace, the code of the
    L2-nearest centroid (ties broken by lower code). One broadcast of the
    nested (m x k_codes)-entry codebook against the corpus, all m argmins
    computed per row as higher-order-function folds — no explode, no
    window, no shuffle. Output: (``id_col``, codes array<int>) plus any
    ``carry_cols`` passed through unchanged (one value per vector — e.g.
    an IVF cluster id), which avoids a re-join against the corpus.

    At 10^10 vectors this is a single corpus scan with map-side broadcast
    work and ZERO exchanges (r15): the codebook — m*k_codes rows, a few KB
    — is nested into one array row per join key and broadcast, and every
    vector computes all m argmins in one higher-order-function fold over
    its row. The previous form exploded the corpus m-fold, broadcast-joined
    it k_codes-fold, and ran the argmin as a row_number window — an
    Exchange + sort of corpus x m x k_codes rows (~10M at sf0.1, the whole
    corpus shuffled 128x at any scale) for a per-row reduction that needs
    no data movement at all (guide §2.4 "remove shuffles outright"). The
    fold iterates codes in ascending (subspace, code) order and replaces
    the running best only on a STRICTLY greater score, which reproduces
    the window's ``desc(_cs), asc(code)`` pick exactly (same dot_fold
    expression, so scores are bit-identical; pinned by the DuckDB
    row_number oracle in tests/test_pq.py). Precondition, unchanged from
    the window form's guards elsewhere in the family: vectors are finite
    and non-null (a NaN score ranks first under desc ordering but loses
    every ``>`` comparison, so the two forms would diverge there)."""
    sub_dim = _sub_dim(dim, m)
    carry_cols = carry_cols or []
    per_cluster = "cluster" in codebooks.columns
    key_cols = ["cluster"] if per_cluster else []
    # one codebook row per join key: entries sorted ascending by
    # (subspace, code) — the fold order that makes "strictly greater
    # replaces" equal the window's lowest-code tie-break
    nested = codebooks.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct("subspace", "code", "centroid"))
        ).alias("_cb_entries")
    )
    if per_cluster:
        # per-cluster codebooks (residual_codebooks): each vector competes
        # only against its OWN cluster's codes — broadcast hash join on the
        # cluster id, still no corpus exchange
        joined = corpus.join(F.broadcast(nested), "cluster")
    else:
        joined = corpus.crossJoin(F.broadcast(nested))

    def _argmin_code(j):
        """Best code of subspace ``j``: left fold over the (code-ascending)
        subspace entries keeping the strictly-best centroid score. The
        score — L2 argmin == argmax(2*<x,c> - <c,c>), the same
        centroid-score ordering as the IVF assignment (similarity.py),
        shared determinism contract — is let-bound so the comparison and
        the replacement read ONE evaluation (no CSE in the expression
        interpreter; see rerank._let)."""
        sub = subvector(F.col(vec_col), j, sub_dim)
        return F.aggregate(
            F.filter(F.col("_cb_entries"), lambda e: e["subspace"] == j),
            F.struct(
                F.lit(None).cast("int").alias("code"),
                F.lit(float("-inf")).alias("s"),
            ),
            lambda acc, e: F.element_at(
                F.transform(
                    F.array(
                        2 * dot_fold(sub, e["centroid"])
                        - dot_fold(e["centroid"], e["centroid"])
                    ),
                    lambda s: F.when(
                        s > acc["s"],
                        F.struct(e["code"].alias("code"), s.alias("s")),
                    ).otherwise(acc),
                ),
                1,
            ),
            lambda acc: acc["code"],
        )

    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)), lambda j: _argmin_code(j)
    )
    return joined.select(
        F.col(id_col), codes.alias("codes"), *carry_cols
    )


def query_luts(
    queries: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query ADC lookup tables: (query_id, lut array<array<double>>)
    where ``lut[j][c] = <q_j, centroid_{j,c}>`` — m*k_codes fold
    evaluations per QUERY, assembled in deterministic (subspace, code)
    order. Broadcast-sized: ~m*k_codes doubles per query."""
    sub_dim = _sub_dim(dim, m)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qsubs = q.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("subspace"),
                        subvector(F.col("qvec"), j, sub_dim).alias("qsub"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("query_id", F.col("s.subspace").alias("subspace"), F.col("s.qsub").alias("qsub"))
    lut_entries = qsubs.join(F.broadcast(codebooks), "subspace").select(
        "query_id",
        F.struct(
            "subspace", "code", dot_fold(F.col("qsub"), F.col("centroid")).alias("d")
        ).alias("e"),
    )
    # assemble LUT as array<array<double>>: sort (subspace, code, d) structs,
    # then reshape into m rows of k_codes — deterministic order by construction
    return lut_entries.groupBy("query_id").agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.transform(
                F.slice(
                    F.array_sort(F.collect_list("e")),
                    j * k_codes + 1,
                    k_codes,
                ),
                lambda s: s["d"],
            ),
        ).alias("lut"),
    )


def adc_score() -> Column:
    """ADC score of a ``codes`` row against a ``lut`` column: m element_at
    lookups summed by an ordered left fold (starting 0.0 — bit-identical to
    an in-order list sum)."""
    return F.aggregate(
        F.zip_with(
            F.col("lut"),
            F.col("codes"),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _exact_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    q: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Exact cosine re-rank of (query_id, neighbor_id) survivors: the
    full-precision vectors enter HERE only, for the bounded survivor set
    (queries x k*refine rows) — broadcast that side so the corpus is probed
    by a broadcast-hash join, not shuffled."""
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).filter((l2_norm(F.col("cvec")) > 0) & ~F.isnan(l2_norm(F.col("cvec"))))  # degenerate-vector guard
    # the QUERY side needs the same guard: a zero-norm/NULL/NaN query
    # vector that slipped through the probe stage (centroid scoring is
    # NULL-tolerant) would turn the cosine below into an ANSI
    # divide-by-zero — one guard here covers all four PQ top-k paths
    # (found by the streaming-ANN degenerate-query test)
    q = q.filter(
        (l2_norm(F.col("qvec")) > 0) & ~F.isnan(l2_norm(F.col("qvec")))
    )
    refined = cvec.join(F.broadcast(cand), "neighbor_id").join(
        F.broadcast(q), "query_id"
    )
    sim = F.round(
        dot_fold(F.col("qvec"), F.col("cvec"))
        / (l2_norm(F.col("qvec")) * l2_norm(F.col("cvec"))),
        9,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        refined.select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    refine: int = 4,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbors via PQ-ADC pre-filter + exact re-rank.

    Stage 1: each query builds its ``m x k_codes`` lookup table (dot of the
    query subvector with every centroid — m*k_codes fold evaluations per
    QUERY, not per pair) and every corpus vector is scored as
    ``sum_j LUT[j][code_j]`` — m element_at lookups per pair, no joins, no
    floating work proportional to dim. Stage 2: exact cosine re-rank of the
    ``k * refine`` survivors (same pattern as quantized_topk). Output
    schema matches ``brute_force_topk``.

    Scale: the scored side carries ONLY the m-byte codes — no embedding
    column enters the all-pairs stage; full-precision vectors are joined
    back for the ~k*refine survivors per query (survivor side broadcast, so
    the corpus parquet is probed, never shuffled). The LUT column is
    ~m*k_codes doubles per query — broadcast with the (bounded) query
    batch."""
    _sub_dim(dim, m)
    codes = pq_encode(corpus, codebooks, m, dim, vec_col, id_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    lut = query_luts(queries, codebooks, m, k_codes, dim, vec_col, id_col)
    # ADC score: m element_at lookups per (query, corpus) pair — the scored
    # rows are (codes, query_id) only, which is the whole point of PQ
    scored = (
        codes.crossJoin(F.broadcast(lut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc_score().alias("adc"))
    )
    wpre = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    cand = scored.withColumn("_prn", F.row_number().over(wpre)).filter(
        F.col("_prn") <= k * refine
    ).select("query_id", "neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    return _exact_rerank(cand, corpus, q, k, vec_col, id_col)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    refine: int = 4,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF x PQ top-k — the production ANN shape at 10^10 vectors: IVF
    prunes WHICH vectors each query scans (to ~n_probe/n_clusters of the
    corpus), PQ-ADC cuts the BYTES per scanned vector to m codes, and the
    exact re-rank restores exact cosine on the k*refine survivors. This
    composes ``similarity.ivf_topk_with_centroids``'s cluster machinery
    with ``adc_topk``'s scoring, generalizing the reference's cone scan
    (DIA.py:72-77) one more step: region pruning -> cluster pruning,
    full-precision scan -> coded scan.

    Plan shape: corpus is scanned ONCE — nearest-centroid assignment
    (broadcast centroids + map-side argmax) feeds straight into PQ encode
    with the cluster id threaded through (``carry_cols``); scoring is an
    equi-join of the coded corpus against the broadcast (query, probed
    cluster, LUT) table on ``cluster`` — a BroadcastHashJoin touching only
    probed clusters, never a full-corpus crossJoin. Per-cluster codebooks
    require the residual path (``ivf_pq_residual_topk``): this function's
    shared-LUT construction indexes codebooks by subspace alone and would
    silently mis-score cluster-keyed tables, so they are rejected
    (review find). Full-precision vectors
    appear only in the survivor re-rank. Codebooks here encode raw vectors
    (matching ``pq_encode``); :func:`ivf_pq_residual_topk` is the
    residual-encoded variant (same plan, better recall at equal m).

    Determinism: centroid assignment/probing use ``centroid_score``'s
    ordered-fold ordering and integer tie-breaks (shared with the IVF-Flat
    oracle), encoding/LUT/ADC are the deterministic PQ stages — the whole
    composition is reproducible in DuckDB (tests/test_ivf_pq.py)."""
    _sub_dim(dim, m)
    # one shared definition of the assignment contract (review find: this
    # block was a line-for-line copy of semdedup.assign_clusters);
    # _nearest_centroids still serves the query-probing side below
    from .semdedup import assign_clusters
    from .similarity import _nearest_centroids

    cent = centroids.select(
        F.col("cluster").cast("int").alias("cluster"),
        F.col("centroid").alias("_cvec"),
    )
    assigned = assign_clusters(
        corpus,
        centroids.select(
            F.col("cluster").cast("int").alias("cluster"), "centroid"
        ),
        vec_col,
        id_col,
    )
    if "cluster" in codebooks.columns:
        raise ValueError(
            "per-cluster codebooks need the residual path: "
            "use ivf_pq_residual_topk"
        )
    coded = pq_encode(
        assigned, codebooks, m, dim, vec_col, id_col, carry_cols=["cluster"]
    ).withColumnRenamed(id_col, "neighbor_id")

    probes = _nearest_centroids(
        queries.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")),
        cent,
        n=n_probe,
        id_alias="query_id",
    ).select("query_id", "cluster")
    lut = query_luts(queries, codebooks, m, k_codes, dim, vec_col, id_col)
    # both sides are bounded by the query batch (|Q| x n_probe vs |Q|),
    # but their SIZE ESTIMATES come through aggregations the planner can't
    # see through, so this 20-row join planned as a SortMergeJoin (two
    # exchanges + sorts) in the r14 plan — hint the broadcast (guide §3.1:
    # estimates are often badly wrong after aggregations; the result is
    # itself broadcast into the scored join two lines down)
    probed_luts = probes.join(F.broadcast(lut), "query_id")

    scored = (
        coded.join(F.broadcast(probed_luts), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc_score().alias("adc"))
    )
    wpre = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    cand = scored.withColumn("_prn", F.row_number().over(wpre)).filter(
        F.col("_prn") <= k * refine
    ).select("query_id", "neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    return _exact_rerank(cand, corpus, q, k, vec_col, id_col)


def _residual(vec: Column, cvec: Column) -> Column:
    """Element-wise residual x - c(x) against the assigned coarse centroid."""
    return F.zip_with(vec, cvec, lambda a, b: a - b)


def _assign_with_centroids(
    corpus: DataFrame,
    cent: DataFrame,
    vec_col: str,
    id_col: str,
    id_alias: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment keeping BOTH the vector and its centroid:
    (id, vec_col, cluster, _cvec) — the broadcast join back on cluster is
    against the n_clusters-row centroid table, map-side free."""
    from .similarity import _nearest_centroids

    out_id = id_alias or id_col
    assigned = _nearest_centroids(
        corpus.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")),
        cent,
        n=1,
        id_alias=out_id,
    ).select(out_id, F.col("_v").alias(vec_col), "cluster")
    return assigned.join(F.broadcast(cent), "cluster")


def residual_codebooks(
    corpus: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    per_cluster: bool = True,
) -> DataFrame:
    """Deterministic RESIDUAL codebooks (Jegou 2011 §IV-A, IVFADC): each
    vector's residual against its assigned coarse centroid is what gets
    product-quantized — residuals are far more concentrated than raw
    vectors (the coarse quantizer has already removed the cluster mean), so
    the same code budget spends its resolution on a smaller cell and recall
    at equal ``m`` strictly improves (tests pin the inequality).

    ``per_cluster=True`` trains one codebook per (cluster, subspace) from
    the cluster's first ``k_codes`` members — (cluster, subspace, code,
    centroid), memory ``n_clusters x m x k_codes x sub_dim``;
    ``per_cluster=False`` is the paper's shared residual quantizer (first
    ``k_codes`` residuals corpus-wide), constant memory. Both are
    broadcast-sized for any realistic (n_clusters, m, k_codes). As with
    ``pq_codebooks``, swap in KMeans-per-subspace centroids for production
    — the downstream plan is identical.

    Scale shape: the shared path takes its ``k_codes`` training rows with
    ``orderBy().limit()`` — a TakeOrdered, per-partition top-k merged on
    the driver, never a global sort. The per-cluster path ranks within
    clusters (a per-cluster sort); codebook TRAINING is a bounded
    offline step — at 10^10 rows run it on a per-cluster sample, exactly
    as :func:`trained_pq_codebooks` samples for KMeans."""
    sub_dim = _sub_dim(dim, m)
    cent = centroids.select(
        F.col("cluster").cast("int").alias("cluster"),
        F.col("centroid").alias("_cvec"),
    )
    assigned = _assign_with_centroids(corpus, cent, vec_col, id_col)
    res = assigned.select(
        F.col(id_col).alias("_cb_id"),
        "cluster",
        _residual(F.col(vec_col), F.col("_cvec")).alias("_cb_vec"),
    )
    if per_cluster:
        w = Window.partitionBy("cluster").orderBy("_cb_id")
        coded = res.withColumn("code", F.row_number().over(w) - 1).filter(
            F.col("code") < k_codes
        )
    else:
        # TakeOrdered + tiny window, not a global row_number over the
        # corpus (Window.orderBy with no partition keys funnels every row
        # through ONE task — a scale-killer for a k_codes-row output)
        head = res.orderBy("_cb_id").limit(k_codes)
        # the no-partition WARN this emits is expected and harmless —
        # the frame is limit(k_codes)-bounded, one partition is the plan
        w = Window.orderBy("_cb_id")
        coded = head.withColumn("code", F.row_number().over(w) - 1)
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                subvector(F.col("_cb_vec"), j, sub_dim).alias("centroid"),
            )
            for j in range(m)
        ]
    )
    keys = ["cluster"] if per_cluster else []
    return coded.select(*keys, "code", F.explode(subs).alias("s")).select(
        *keys,
        F.col("s.subspace").alias("subspace"),
        "code",
        F.col("s.centroid").alias("centroid"),
    )


def ivf_pq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    res_codebooks: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    refine: int = 4,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF x PQ top-k with RESIDUAL encoding — the full IVFADC composition
    (Jegou 2011 §IV-A). Corpus vectors store codes of ``x - c(x)``; at
    query time the estimated inner product decomposes as

        <q, x> ~= <q, c(x)> + <q, r_hat(x)>

    so scoring inside a probed cluster is the raw-query-vs-residual-codebook
    ADC sum plus a per-(query, cluster) OFFSET ``<q, c>`` — one extra double
    in the broadcast LUT table, nothing else changes: the plan is byte-for-
    byte the raw composition's (single corpus scan into assignment+encode,
    BroadcastHashJoin on probed clusters, exact re-rank of k*refine
    survivors; plan-guarded in tests/test_ivf_pq.py). The cross-cluster
    offset is what makes ADC scores comparable BETWEEN probed clusters.

    ``res_codebooks`` comes from :func:`residual_codebooks` — per-cluster
    (cluster, subspace, code, centroid) or shared (subspace, code,
    centroid); both broadcast. LUTs are built per (query, PROBED cluster)
    only — queries x n_probe x m x k_codes doubles, bounded by the probe
    budget, never by n_clusters."""
    _sub_dim(dim, m)
    cent = centroids.select(
        F.col("cluster").cast("int").alias("cluster"),
        F.col("centroid").alias("_cvec"),
    )
    per_cluster = "cluster" in res_codebooks.columns

    # corpus: assign -> residual -> PQ-encode (cluster threaded through;
    # per-cluster codebooks join on (subspace, cluster) inside pq_encode)
    assigned = _assign_with_centroids(corpus, cent, vec_col, id_col)
    residuals = assigned.select(
        F.col(id_col),
        "cluster",
        _residual(F.col(vec_col), F.col("_cvec")).alias(vec_col),
    )
    coded = pq_encode(
        residuals, res_codebooks, m, dim, vec_col, id_col, carry_cols=["cluster"]
    ).withColumnRenamed(id_col, "neighbor_id")

    # queries: probe n_probe clusters; per (query, probed cluster) build the
    # RAW-query-vs-residual-codebook LUT and the <q, c> offset
    from .similarity import _nearest_centroids

    probes = _nearest_centroids(
        queries.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")),
        cent,
        n=n_probe,
        id_alias="query_id",
    ).select("query_id", "cluster")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    offsets = (
        probes.join(F.broadcast(cent), "cluster")
        .join(q, "query_id")
        .select(
            "query_id",
            "cluster",
            dot_fold(F.col("qvec"), F.col("_cvec")).alias("offset"),
            "qvec",
        )
    )
    # filter-based LUT assembly (vs query_luts' fixed-stride slice): robust
    # to clusters holding fewer than k_codes members, where a per-cluster
    # codebook legitimately has short code rows
    probed_luts = _residual_probed_luts(offsets, res_codebooks, m, dim, per_cluster)

    scored = (
        coded.join(F.broadcast(probed_luts), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.col("offset") + adc_score()).alias("adc"),
        )
    )
    wpre = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    cand = scored.withColumn("_prn", F.row_number().over(wpre)).filter(
        F.col("_prn") <= k * refine
    ).select("query_id", "neighbor_id")
    return _exact_rerank(cand, corpus, q, k, vec_col, id_col)


# ---------------------------------------------------------------- persistence
#
# Production ANN is build-once / query-many: the corpus is assigned and
# PQ-encoded ONCE into a persistent index, and every query batch afterwards
# touches only (a) the tiny centroid/codebook tables and (b) the code rows
# of its PROBED clusters. Persisting the codes hive-partitioned by
# ``cluster`` turns probe pruning into PARTITION pruning: a query batch
# lists and scans only n_probe * n_queries partitions of the code table —
# at 10^10 vectors the per-batch scan is bounded by the probe budget, not
# the corpus (the same driver-tiny IN-list pattern as the streaming gate
# stores' fp_bucket pruning). The full-precision corpus table is touched
# only by the exact re-rank of k*refine survivors.

from dataclasses import dataclass


@dataclass
class PQIndexMeta:
    m: int
    k_codes: int
    dim: int
    residual: bool
    per_cluster_codebooks: bool


class PQIndex:
    """Handle over a persisted IVF-PQ index rooted at a directory:
    ``centroids.parquet`` (cluster, centroid), ``codebooks.parquet``
    ([cluster,] subspace, code, centroid), ``codes.parquet`` partitioned
    by cluster (cluster=<id>/... with neighbor_id, codes), and a one-row
    ``meta.parquet``."""

    def __init__(self, spark, root: str, meta: PQIndexMeta) -> None:
        self.spark = spark
        self.root = root
        self.meta = meta

    # pinned read schemas: hive partition inference must not retype cluster
    _CODES_SCHEMA = "cluster int, neighbor_id long, codes array<int>"

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/centroids.parquet")

    def codebooks(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/codebooks.parquet")

    def compact(self, num_tasks: int = 64) -> None:
        """Fold the append-per-batch code store back to one file per
        cluster directory (fs.compact_store — the same maintenance rule
        as APDB tables and the streaming gate stores). Incremental
        appends (append_to_pq_index, StreamingIndexAppend) leave one file
        per touched cluster per batch; run this as scheduled maintenance
        so probe-time read fan-in stays bounded. Distinct ids are
        preserved exactly — queries are unchanged (pinned in
        test_index_append_stream).

        Doubles as the REPAIR path for the append family's single-writer
        assumption: the id-idempotent append is read-store -> anti-join
        -> write with no locking, so two CONCURRENT writers can both see
        an id as absent and double-insert it. An id's codes are immutable
        (frozen quantizers), so duplicate-id rows are bit-identical and
        the (cluster, neighbor_id) dropDuplicates here restores
        uniqueness without changing any query answer; with the documented
        single writer it is a no-op."""
        from ..fs import TableFS

        TableFS(self.spark, self.root).compact_store(
            self.spark,
            f"{self.root}/codes.parquet",
            self._CODES_SCHEMA,
            "cluster",
            sort_cols=["neighbor_id"],
            num_tasks=num_tasks,
            dedup_cols=["cluster", "neighbor_id"],
        )

    def codes(self) -> DataFrame:
        return self.spark.read.schema(self._CODES_SCHEMA).parquet(
            f"{self.root}/codes.parquet"
        )


def _encode_for_index(
    corpus: DataFrame,
    cent: DataFrame,
    codebooks: DataFrame,
    m: int,
    dim: int,
    residual: bool,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(cluster, neighbor_id, codes) for the partitioned code store: one
    scan through nearest-centroid assignment into PQ encoding (raw or
    residual), cluster id carried. Shared by build and append — the
    append path encodes with the SAME frozen quantizers, which is what
    keeps incrementally-grown indexes query-identical to a rebuild.

    Ingestion guard (garbage-resilience rule: degenerate vectors never
    rank): NULL vectors, wrong-dimension vectors, and vectors with any
    NULL/NaN element are EXCLUDED at encode time — unguarded they would
    assign to an arbitrary cluster with all-zero codes and surface as
    phantom neighbors."""
    well_formed = (
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) == dim)
        & ~F.exists(vec_col, lambda x: x.isNull() | F.isnan(x))
    )
    assigned = _assign_with_centroids(
        corpus.filter(well_formed), cent, vec_col, id_col
    )
    if residual:
        encoded_input = assigned.select(
            F.col(id_col),
            "cluster",
            _residual(F.col(vec_col), F.col("_cvec")).alias(vec_col),
        )
    else:
        encoded_input = assigned.select(F.col(id_col), "cluster", vec_col)
    return pq_encode(
        encoded_input, codebooks, m, dim, vec_col, id_col, carry_cols=["cluster"]
    ).select(
        "cluster", F.col(id_col).cast("long").alias("neighbor_id"), "codes"
    )


def build_pq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    root: str,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    residual: bool = False,
) -> PQIndex:
    """One corpus scan: nearest-centroid assignment feeds PQ encoding (of
    the raw vector, or of the residual ``x - c(x)`` when ``residual=True``)
    with the cluster id carried through; codes land hive-partitioned by
    cluster. Centroid/codebook tables and the meta row are persisted
    alongside so a later session reconstructs the exact query plan from
    the directory alone."""
    _sub_dim(dim, m)
    if not residual and "cluster" in codebooks.columns:
        raise ValueError(
            "per-cluster codebooks require residual=True: the raw-vector "
            "query path (pq_index_topk's shared-LUT branch) cannot score "
            "cluster-keyed codebooks"
        )
    spark = corpus.sparkSession
    cent = centroids.select(
        F.col("cluster").cast("int").alias("cluster"),
        F.col("centroid").alias("_cvec"),
    )
    coded = _encode_for_index(
        corpus, cent, codebooks, m, dim, residual, vec_col, id_col
    )
    coded.repartition("cluster").write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(f"{root}/codes.parquet")
    cent.select("cluster", F.col("_cvec").alias("centroid")).write.mode(
        "overwrite"
    ).parquet(f"{root}/centroids.parquet")
    codebooks.write.mode("overwrite").parquet(f"{root}/codebooks.parquet")
    meta = PQIndexMeta(
        m=m,
        k_codes=k_codes,
        dim=dim,
        residual=residual,
        per_cluster_codebooks="cluster" in codebooks.columns,
    )
    spark.createDataFrame(
        [(meta.m, meta.k_codes, meta.dim, meta.residual, meta.per_cluster_codebooks)],
        "m int, k_codes int, dim int, residual boolean, per_cluster_codebooks boolean",
    ).write.mode("overwrite").parquet(f"{root}/meta.parquet")
    return PQIndex(spark, root, meta)




def append_to_pq_index(
    index: PQIndex,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> PQIndex:
    """Incremental index maintenance — encode NEW vectors with the
    index's FROZEN quantizers (persisted centroids + codebooks) and
    append their codes to the hive-partitioned store; no retraining, no
    rebuild, no touch of existing code files. This is how production IVF
    indexes absorb daily corpus growth (re-train only when drift erodes
    recall): the appended codes are byte-identical to what a full rebuild
    with the same quantizers would produce, so queries against the grown
    index equal queries against a from-scratch index over the union
    (pinned in test_pq_index). Caller owns id uniqueness across
    generations, like any append sink.

    SINGLE WRITER assumed: appends are unlocked read-then-write, so two
    concurrent appenders (e.g. a backfill racing the bound stream) can
    both see an id as absent and double-insert it. Serialize writers; if
    a race did double-insert, :meth:`PQIndex.compact` dedups
    (cluster, neighbor_id) as the repair path (safe — an id's codes are
    immutable under the frozen quantizers).

    Scale shape: one scan of the NEW vectors only (assignment -> encode,
    the same single-pass plan as the build), one partitioned append —
    cost proportional to the delta, not the index."""
    meta = index.meta
    cent = index.centroids().select(
        "cluster", F.col("centroid").alias("_cvec")
    )
    coded = _encode_for_index(
        new_vectors,
        cent,
        index.codebooks(),
        meta.m,
        meta.dim,
        meta.residual,
        vec_col,
        id_col,
    )
    coded.repartition("cluster").write.mode("append").partitionBy(
        "cluster"
    ).parquet(f"{index.root}/codes.parquet")
    return index


def load_pq_index(spark, root: str) -> PQIndex:
    r = spark.read.parquet(f"{root}/meta.parquet").first()
    return PQIndex(
        spark,
        root,
        PQIndexMeta(r.m, r.k_codes, r.dim, r.residual, r.per_cluster_codebooks),
    )


def pq_index_topk(
    index: PQIndex,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k against a persisted index: probe -> PARTITION-PRUNED code
    scan -> ADC -> exact re-rank. The probed cluster ids are collected
    driver-side (bounded by n_queries * n_probe ints — the same driver-tiny
    metadata pattern as the gate stores' bucket pruning) and pushed into
    the code read as an IN filter, so the scan carries PartitionFilters
    and lists only the probed directories. ``corpus`` is consulted ONLY by
    the exact re-rank of the k*refine survivors (broadcast-probed, never
    shuffled). Output schema matches the in-memory compositions, and for
    the same quantizers the results are row-identical (tests)."""
    from .similarity import _nearest_centroids

    meta = index.meta
    m, k_codes, dim = meta.m, meta.k_codes, meta.dim
    cent = index.centroids().select(
        "cluster", F.col("centroid").alias("_cvec")
    ).transform(pin, eager=False)
    codebooks = index.codebooks().transform(pin, eager=False)

    probes = _nearest_centroids(
        queries.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")),
        cent,
        n=n_probe,
        id_alias="query_id",
    ).select("query_id", "cluster").transform(pin, eager=True)
    probed_ids = [r.cluster for r in probes.select("cluster").distinct().collect()]
    coded = index.codes().filter(F.col("cluster").isin(probed_ids))

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    if meta.residual:
        offsets = (
            probes.join(F.broadcast(cent), "cluster")
            .join(q, "query_id")
            .select(
                "query_id",
                "cluster",
                dot_fold(F.col("qvec"), F.col("_cvec")).alias("offset"),
                "qvec",
            )
        )
        probed_luts = _residual_probed_luts(
            offsets, codebooks, m, dim, meta.per_cluster_codebooks
        )
        score = F.col("offset") + adc_score()
    else:
        lut = query_luts(queries, codebooks, m, k_codes, dim, vec_col, id_col)
        probed_luts = probes.join(lut, "query_id")
        score = adc_score()

    scored = (
        coded.join(F.broadcast(probed_luts), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("adc"))
    )
    wpre = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    cand = scored.withColumn("_prn", F.row_number().over(wpre)).filter(
        F.col("_prn") <= k * refine
    ).select("query_id", "neighbor_id")
    return _exact_rerank(cand, corpus, q, k, vec_col, id_col)


def _residual_probed_luts(
    offsets: DataFrame, res_codebooks: DataFrame, m: int, dim: int, per_cluster: bool
) -> DataFrame:
    """(query_id, cluster, offset, lut) for probed pairs — the query side
    of the IVFADC composition, shared by ivf_pq_residual_topk and
    pq_index_topk. ``offsets`` carries (query_id, cluster, offset, qvec)."""
    sub_dim = dim // m
    qsubs = F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                subvector(F.col("qvec"), j, sub_dim).alias("qsub"),
            )
            for j in range(m)
        ]
    )
    entries = offsets.select(
        "query_id", "cluster", "offset", F.explode(qsubs).alias("s")
    ).select(
        "query_id",
        "cluster",
        "offset",
        F.col("s.subspace").alias("subspace"),
        F.col("s.qsub").alias("qsub"),
    )
    cb_keys = ["subspace", "cluster"] if per_cluster else ["subspace"]
    lut_entries = entries.join(F.broadcast(res_codebooks), cb_keys).select(
        "query_id",
        "cluster",
        "offset",
        F.struct(
            "subspace", "code", dot_fold(F.col("qsub"), F.col("centroid")).alias("d")
        ).alias("e"),
    )
    sorted_e = F.array_sort(F.collect_list("e"))
    return lut_entries.groupBy("query_id", "cluster").agg(
        F.first("offset").alias("offset"),
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.transform(
                F.filter(sorted_e, lambda s: s["subspace"] == j),
                lambda s: s["d"],
            ),
        ).alias("lut"),
    )


def trained_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> DataFrame:
    """KMeans-trained codebooks — the production quantizer (Jegou 2011
    §II-C trains exactly this way): one MLlib KMeans fit PER SUBSPACE over
    that subspace's subvectors, centers lifted into the same (subspace,
    code, centroid) table the deterministic ``pq_codebooks`` emits, so the
    entire encode/LUT/ADC plan downstream is byte-identical — only the
    centroid VALUES differ.

    Cost: m distributed fits (m corpus passes). At 100 TB pass
    ``sample_fraction`` — PQ codebooks need ~100k-1M training points, not
    the corpus (the paper trains on a held-out sample), and a deterministic
    per-row hash sample keeps the run reproducible. Pass residuals
    (``x - c(x)``, see :func:`residual_codebooks`) as ``vectors`` to train
    residual codebooks the same way."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sub_dim = _sub_dim(dim, m)
    base = vectors.select(F.col(vec_col).alias("_v"))
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    rows = []
    for j in range(m):
        subs = base.select(
            array_to_vector(subvector(F.col("_v"), j, sub_dim)).alias("_features")
        )
        model = KMeans(
            k=k_codes, seed=seed + j, featuresCol="_features", predictionCol="_c"
        ).fit(subs)
        for code, center in enumerate(model.clusterCenters()):
            rows.append((j, code, [float(x) for x in center]))
    return vectors.sparkSession.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    )
