"""Vector-similarity search queries over the embeddings table — the
generalization of the reference's cone cross-match (DIA.py:72-77, SURVEY.md
J1) to arbitrary-dimension embeddings. Builders in operators/similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin

from ..operators.similarity import (
    RECALL_QUERY_MAX_ID,
    brute_force_topk,
    dot,
    exact_topk,
    l2_norm,
    multiprobe_masks,
    multitable_lsh_topk,
)
from ..sources.catalog import load_table
from . import query

# Embedding width knob (None = ordered-fold dot products). Measured at
# dim=64 the unrolled dot_chain variant is SLOWER than the fold: the
# 64-term generated code exceeds the JIT method limits and the whole
# expression tree falls back to interpreted evaluation (~10x worse on the
# all-pairs join). The fold's per-element lambda stays a tight interpreter
# loop — keep it.
_DIM = None

_COS = """round(
      list_dot_product(qv, cv)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 9)"""


@query(
    "ann_topk_brute",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 20
    ),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {_COS} AS cosine_sim
      FROM c, q WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (brute-force top-k); J1",
    headline=True,
)
def ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors vec_id<20: broadcast
    queries x corpus scan, ordered-fold dot product, per-query window."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return brute_force_topk(emb, queries, k=5, dim=_DIM)


# OR-amplified multi-probe LSH parameters (operators/similarity.py
# multitable_lsh_topk defaults) — tuned on the bench embeddings to recall
# 0.82 @ sf0.1 / 0.70 @ sf0.01 at a ~25% candidate fraction; the r6
# single-table form measured recall 0.11.
_LSH_BITS, _LSH_TABLES, _LSH_MP, _LSH_DIM = 12, 12, 2, 64
_LSH_QMAX = RECALL_QUERY_MAX_ID["ann_topk_lsh"]


def _lsh_bucket_sql(t: int) -> str:
    """DuckDB expression for table ``t``'s bucket — the same diagonal
    hyperplanes as _pair_hyperplane_bucket, bit i = (v[p] - v[q] > 0)."""
    terms = []
    for i in range(_LSH_BITS):
        p = (t * _LSH_BITS + i) % _LSH_DIM
        q = (p + 1 + t) % _LSH_DIM
        terms.append(
            f"CASE WHEN v[{p + 1}] - v[{q + 1}] > 0"
            f" THEN {1 << i}::BIGINT ELSE 0::BIGINT END"
        )
    return " + ".join(terms)


_LSH_CB = "\n      UNION ALL ".join(
    f"SELECT vec_id, {t} AS tbl, ({_lsh_bucket_sql(t)}) AS bucket FROM e"
    for t in range(_LSH_TABLES)
)
_LSH_MASKS = ", ".join(
    f"{m}::BIGINT" for m in multiprobe_masks(_LSH_BITS, _LSH_MP)
)


@query(
    "ann_topk_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS (
      {_LSH_CB}
    ),
    qp AS (
      SELECT vec_id AS query_id, tbl, xor(bucket, m.m) AS bucket
      FROM cb, unnest([{_LSH_MASKS}]) AS m(m)
      WHERE vec_id < {_LSH_QMAX}
    ),
    cand AS (
      SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id
      FROM cb c JOIN qp ON c.tbl = qp.tbl AND c.bucket = qp.bucket
      WHERE c.vec_id <> qp.query_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_dot_product(qe.v, ce.v)
                   / (sqrt(list_dot_product(qe.v, qe.v))
                      * sqrt(list_dot_product(ce.v, ce.v))), 9) AS cosine_sim
      FROM cand
      JOIN e qe ON qe.vec_id = cand.query_id
      JOIN e ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (OR-amplified multi-probe sign-LSH ANN)",
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via OR-amplified multi-probe LSH: 12 tables of 12
    diagonal sign-hyperplanes, queries probe all buckets within Hamming
    distance 2, candidates de-duplicated then exact-cosine re-ranked —
    recall 0.82 at the bench shape (vs 0.11 for the r6 single-table form)
    at a ~25% candidate fraction, with no cross join."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _LSH_QMAX)
    return multitable_lsh_topk(
        emb,
        queries,
        k=5,
        n_bits=_LSH_BITS,
        n_tables=_LSH_TABLES,
        multiprobe=_LSH_MP,
        dim=_LSH_DIM,
    )


_CSCORE = "2 * list_dot_product({v}, cent.cv) - list_dot_product(cent.cv, cent.cv)"


@query(
    "ann_topk_ivf",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT CAST(vec_id AS INT) AS cluster, v AS cv FROM e WHERE vec_id < 16),
    assigned AS (
      SELECT neighbor_id, cvec, cluster FROM (
        SELECT e.vec_id AS neighbor_id, e.v AS cvec, cent.cluster,
               {_CSCORE.format(v='e.v')} AS s,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_CSCORE.format(v='e.v')} DESC, cent.cluster
               ) AS rn
        FROM e CROSS JOIN cent
      ) t WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cluster FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, cent.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_CSCORE.format(v='q.v')} DESC, cent.cluster
               ) AS rn
        FROM e q CROSS JOIN cent WHERE q.vec_id < 20
      ) t WHERE rn <= 2
    ),
    scored AS (
      SELECT p.query_id, a.neighbor_id,
             {_COS.replace('qv', 'p.qv').replace('cv', 'a.cvec')} AS cosine_sim
      FROM assigned a JOIN probes p USING (cluster)
      WHERE a.neighbor_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (IVF-Flat ANN: centroid assignment + n_probe pruning, cluster-side)",
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 with genuine probe pruning (16 centroids,
    n_probe=2 — each query scans ~1/8 of the corpus), fully oracle-checked:
    the coarse quantizer is a deterministic fixed centroid table (the first
    16 corpus vectors) so DuckDB reproduces assignment, probing, and top-k
    bit-for-bit via the shared centroid_score ordering. The KMeans-trained
    variant (operators.similarity.ivf_topk) runs the same cluster-side plan
    with learned centroids; its recall is pinned by
    tests/test_similarity_ivf.py."""
    from ..operators.similarity import ivf_topk_with_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    return ivf_topk_with_centroids(emb, queries, centroids, k=5, n_probe=2, dim=_DIM)


_PQ_SUB = 8  # dim=64 / m=8 subspaces
_PQ_ADC_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT CAST(vec_id AS INT) AS cluster, v AS cv FROM e WHERE vec_id < 16),
    assigned AS (
      SELECT vec_id AS neighbor_id, cluster FROM (
        SELECT e.vec_id, cent.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_CSCORE.format(v='e.v')} DESC, cent.cluster
               ) AS rn
        FROM e CROSS JOIN cent
      ) t WHERE rn = 1
    ),
    cb AS (SELECT CAST(vec_id AS INT) AS code, v FROM e WHERE vec_id < 16),
    cbsubs AS (
      SELECT code, j.j AS subspace,
             v[j.j * {_PQ_SUB} + 1 : (j.j + 1) * {_PQ_SUB}] AS centroid
      FROM cb, unnest(range(0, 8)) AS j(j)
    ),
    subs AS (
      SELECT vec_id, j.j AS subspace,
             v[j.j * {_PQ_SUB} + 1 : (j.j + 1) * {_PQ_SUB}] AS sub
      FROM e, unnest(range(0, 8)) AS j(j)
    ),
    codes AS (
      SELECT vec_id AS neighbor_id, subspace, code FROM (
        SELECT s.vec_id, s.subspace, c.code,
               ROW_NUMBER() OVER (
                 PARTITION BY s.vec_id, s.subspace
                 ORDER BY 2 * list_dot_product(sub, centroid)
                          - list_dot_product(centroid, centroid) DESC, code
               ) AS rn
        FROM subs s JOIN cbsubs c ON s.subspace = c.subspace
      ) t WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT q.vec_id, cent.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_CSCORE.format(v='q.v')} DESC, cent.cluster
               ) AS rn
        FROM e q CROSS JOIN cent WHERE q.vec_id < 10
      ) t WHERE rn <= 2
    ),
    qsubs AS (
      SELECT vec_id AS query_id, j.j AS subspace,
             v[j.j * {_PQ_SUB} + 1 : (j.j + 1) * {_PQ_SUB}] AS qsub
      FROM e, unnest(range(0, 8)) AS j(j) WHERE vec_id < 10
    ),
    adc AS (
      SELECT p.query_id, a.neighbor_id,
             list_sum(list(list_dot_product(q.qsub, cb2.centroid)
                           ORDER BY c.subspace)) AS adc
      FROM probes p
      JOIN assigned a USING (cluster)
      JOIN codes c ON c.neighbor_id = a.neighbor_id
      JOIN qsubs q ON q.query_id = p.query_id AND q.subspace = c.subspace
      JOIN cbsubs cb2 ON cb2.subspace = c.subspace AND cb2.code = c.code
      WHERE a.neighbor_id <> p.query_id
      GROUP BY p.query_id, a.neighbor_id
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY adc DESC, neighbor_id
        ) AS prn FROM adc
      ) t WHERE prn <= 40
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_dot_product(qe.v, ce.v)
                   / (sqrt(list_dot_product(qe.v, qe.v))
                      * sqrt(list_dot_product(ce.v, ce.v))), 9) AS cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY cand.query_id
               ORDER BY round(list_dot_product(qe.v, ce.v)
                   / (sqrt(list_dot_product(qe.v, qe.v))
                      * sqrt(list_dot_product(ce.v, ce.v))), 9) DESC,
                   cand.neighbor_id
             ) AS rank
      FROM cand
      JOIN e qe ON qe.vec_id = cand.query_id
      JOIN e ce ON ce.vec_id = cand.neighbor_id
    ) t WHERE rank <= 5
"""


@query(
    "ivf_pq_topk",
    oracle=_PQ_ADC_ORACLE,
    survey="ext:similarity (IVF x PQ-ADC composed ANN: cluster pruning + coded scoring + exact re-rank); J1 generalization",
)
def ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF x PQ top-5 — the production 10^10-vector ANN shape under the
    driver oracle: 16 fixed centroids (first corpus vectors, the shared
    deterministic-quantizer pattern), n_probe=2 cluster pruning, PQ m=8 /
    k_codes=16 ADC scoring on codes only, exact cosine re-rank of the
    k*refine=40 survivors (refine=8: measured recall 0.78 @ sf0.1 vs
    0.56 at refine=4, for free — the ADC stage dominates and the extra
    20 survivors are noise; r7 margin fix for the 0.06-slim floor). Every stage (assignment, encoding, LUT, ADC sum,
    both windows) is engine-reproducible; DuckDB mirrors the ordered ADC
    fold with list(ORDER BY) + list_sum (operators/pq.py)."""
    from ..operators.pq import ivf_pq_topk as _ivf_pq
    from ..operators.pq import pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    # the query batch feeds THREE plan branches (centroid probing, LUT
    # construction, the exact re-rank) — without the cut each branch
    # carries its own full parquet scan of the corpus behind the
    # vec_id < 10 pushdown (3 embeddings subtrees in the r14 plan); one
    # lazy pin makes all three read the same in-memory 10-row frame
    # (r15, VERDICT item 4 — same pattern as the index artifacts below)
    queries = emb.filter(F.col("vec_id") < 10).transform(pin, eager=False)
    # the index artifacts are tiny (16 centroids, m*k_codes=128 codebook
    # rows) but feed several plan branches (assignment, encoding, LUTs) —
    # checkpoint them, modeling the production shape where both are
    # PREBUILT tables, so their derivation runs once instead of per branch
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    ).transform(pin, eager=False)
    cb = pq_codebooks(emb, m=8, k_codes=16, dim=64).transform(pin, eager=False)
    return _ivf_pq(
        emb, queries, centroids, cb, k=5, n_probe=2, refine=8,
        m=8, k_codes=16, dim=64,
    )


# Rotated out of the 50-cap registry in driver round 13 (slot to the
# r12 training-data families — COVERAGE.md "Registry rotation history");
# the SAME DuckDB oracle (below) runs driver-grade in-suite in
# tests/test_unregistered_batteries.py, and the similarity family keeps
# seven registered rows (ann_topk_brute/lsh/ivf, doc_embed_ann,
# quantized_topk, ivf_pq_topk, hamming_topk) plus the recall-floor
# bench record.
EMBEDDING_NEAR_DUP_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.v AS qv, b.v AS cv
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, {_COS} AS cosine_sim
    FROM pairs
    WHERE {_COS} >= 0.4
    """


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine >= 0.4 — the threshold form of the
    reference's cone cross-match (inner product > cos(theta), DIA.py:72-77)."""
    from ..operators.dedup import _spread

    emb = load_table(spark, sf_dir, "embeddings")
    a = _spread(emb, "vec_id").select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        l2_norm(F.col("embedding"), _DIM).alias("na"),
    ).filter((F.col("na") > 0) & ~F.isnan("na"))  # degenerate-vector guard (no-op on the
    # fixture, so the DuckDB oracle is unchanged; see brute_force_topk)
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding"), _DIM).alias("nb"),
    ).filter((F.col("nb") > 0) & ~F.isnan("nb"))
    sim = F.round(dot(F.col("va"), F.col("vb"), _DIM) / (F.col("na") * F.col("nb")), 9)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.4)
    )


@query(
    "quantized_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
               AS amax
      FROM embeddings
    ),
    qz AS (
      SELECT vec_id, v, amax / 127.0 AS scale,
             CASE WHEN amax = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(
                    v, x -> CAST(floor(x / (amax / 127.0) + 0.5) AS BIGINT))
             END AS qvint
      FROM e
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, scale AS qscale, qvint AS qq
          FROM qz WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, scale AS cscale, qvint AS qc
          FROM qz),
    scored AS (
      SELECT query_id, neighbor_id, qv, cv,
             (CAST(list_dot_product(qc, qq) AS DOUBLE) * qscale) * cscale
               AS approx_dot
      FROM c, q WHERE neighbor_id <> query_id
    ),
    cand AS (
      SELECT query_id, neighbor_id, qv, cv FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY approx_dot DESC, neighbor_id
        ) AS prn
        FROM scored
      ) t WHERE prn <= 40
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT query_id, neighbor_id, {_COS} AS cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY {_COS} DESC, neighbor_id
             ) AS rank
      FROM cand
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (int8 quantized pre-filter + exact re-rank top-k)",
)
def quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors via int8 symmetric quantization: integer-dot
    pre-filter to k*refine=20 candidates per query, exact float cosine
    re-rank. Every stage is closed-form (floor-half-up rounding, exact int64
    dot) so DuckDB reproduces candidates, similarities, and ranks
    bit-for-bit (operators/quantize.py)."""
    from ..operators.quantize import quantized_topk as _qtopk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return _qtopk(emb, queries, k=5, refine=4)


@query(
    "semdedup_drops",
    oracle="""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 1000000, v FROM base WHERE vec_id < 30
    ),
    cent AS (
      SELECT CASE vec_id WHEN 0 THEN 0 WHEN 123 THEN 1
                         WHEN 251 THEN 2 WHEN 377 THEN 3 END AS cluster,
             v AS cv
      FROM base WHERE vec_id IN (0, 123, 251, 377)
    ),
    assigned AS (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, cent.cluster,
          ROW_NUMBER() OVER (
            PARTITION BY e.vec_id
            ORDER BY 2 * list_dot_product(e.v, cent.cv)
                     - list_dot_product(cent.cv, cent.cv) DESC, cent.cluster
          ) AS rn
        FROM e, cent
      ) t WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 9) AS cosine_sim
      FROM assigned a JOIN assigned b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    ),
    flt AS (SELECT * FROM pairs WHERE cosine_sim >= 0.95)
    SELECT vec_id, canonical_id, cosine_sim FROM (
      SELECT id_b AS vec_id, id_a AS canonical_id,
        MAX(cosine_sim) OVER (PARTITION BY id_b) AS cosine_sim,
        ROW_NUMBER() OVER (
          PARTITION BY id_b ORDER BY cosine_sim DESC, id_a ASC
        ) AS rn
      FROM flt
    ) t WHERE rn = 1
    """,
    survey="ext:semdedup (SemDeDup drop log: cluster-assign + within-cluster cosine, Abbas et al. 2023)",
)
def semdedup_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup drop log (operators/semdedup.py) on a clone-seeded corpus:
    embeddings ∪ exact clones of vec_id<30 (ids +1e6), centroids pinned to
    four corpus vectors — every clone must be dropped with its original as
    canonical. Assignment collapses map-side behind a broadcast centroid
    table; the pair join shuffles once per side on the cluster key."""
    from ..operators.semdedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(clones)
    lookup = spark.createDataFrame(
        [(c, v) for c, v in enumerate([0, 123, 251, 377])],
        "cluster int, vec_id long",
    )
    cents = emb.join(F.broadcast(lookup), "vec_id").select(
        "cluster", F.col("embedding").alias("centroid")
    )
    _, dropped = semantic_dedup(corpus, cents, eps=0.05)
    return dropped


@query(
    "hamming_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (
      SELECT vec_id AS query_id, v AS qv,
             list_transform(v, x -> CAST(floor(
               x / (list_max(list_transform(v, y -> abs(y))) / 127.0) + 0.5
             ) AS BIGINT)) AS q8
      FROM e WHERE vec_id < 20
    ),
    c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e),
    scored AS (
      SELECT query_id, neighbor_id, qv, cv,
             list_sum(list_transform(range(1, 65),
               i -> q8[i] * (CASE WHEN cv[i] > 0 THEN 1 ELSE -1 END)))
               AS asym_score
      FROM c, q WHERE neighbor_id <> query_id
    ),
    cand AS (
      SELECT query_id, neighbor_id, qv, cv FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY asym_score DESC, neighbor_id
        ) AS prn
        FROM scored
      ) t WHERE prn <= 80
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT query_id, neighbor_id, {_COS} AS cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY {_COS} DESC, neighbor_id
             ) AS rank
      FROM cand
    ) t WHERE rank <= 5
    """,
    survey="ext:similarity (1-bit binary quantization: asymmetric sign-signature pre-filter + exact re-rank)",
)
def hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors via 1-bit sign signatures: 64 dims pack into
    ONE long per corpus vector, the asymmetric pre-filter (int8-quantized
    query dotted with the unpacked corpus sign pattern — exact integer
    math) keeps k*refine=80 candidates per query, exact float cosine
    re-ranks. The sign predicate (x > 0), the int8 rounding formula, and
    the integer fold are engine-portable, so DuckDB reproduces candidates
    and ranks exactly (operators/quantize.py hamming_topk; measured
    recall 0.91 at the sf0.1 bench shape against the 0.8 floor — up from
    0.67 with symmetric Hamming at the SAME candidate fraction
    80/2000 = 4%)."""
    from ..operators.quantize import hamming_topk as _htopk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return _htopk(emb, queries, k=5, refine=16, dim=64)


# --------------------------------------------------------------------------
# MMR diversified re-ranking (operators/rerank.py) — driver-registered in
# round 10. Greedy MMR is deterministic given a fixed candidate frame and
# the engine-portable rounding convention, so the k selection rounds unroll
# into plain ANSI SQL: pick argmax(0.5*rel) first, then per round join the
# survivors to the previous pick, fold the pairwise cosine into the running
# max, and take argmax(0.5*rel - 0.5*maxsim). Ties break by doc_id on both
# engines (the operator's min_by struct tiebreak).

_MMR_K = 5


def _pair_cos(a: str, b: str) -> str:
    """DuckDB cosine(a, b) in the operator's exact operand order,
    rounded to the portability convention's 9 digits (mirrors
    operators/similarity.safe_cosine under round_digits=9)."""
    return (
        f"round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b}))), 9)"
    )


def _mmr_oracle() -> str:
    cos_qc = _pair_cos("qv", "cv")
    parts = [
        f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    c AS (SELECT vec_id AS doc_id, v AS cv FROM e),
    s0 AS (
      SELECT query_id, doc_id, rel, cv FROM (
        SELECT query_id, doc_id, {cos_qc} AS rel, cv,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY {cos_qc} DESC, doc_id
               ) AS rn
        FROM c, q WHERE doc_id <> query_id
      ) t WHERE rn <= 20
    ),
    p1 AS (
      SELECT query_id, doc_id, rel, cv, 0.5 * rel AS mmr FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY 0.5 * rel DESC, doc_id
        ) AS rn FROM s0
      ) t WHERE rn = 1
    )"""
    ]
    for t in range(2, _MMR_K + 1):
        sim = _pair_cos("s.cv", "p.cv")
        maxsim = sim if t == 2 else f"GREATEST(s.maxsim, {sim})"
        parts.append(
            f"""
    s{t - 1} AS (
      SELECT s.query_id, s.doc_id, s.rel, s.cv, {maxsim} AS maxsim
      FROM s{t - 2} s JOIN p{t - 1} p
        ON s.query_id = p.query_id AND s.doc_id <> p.doc_id
    ),
    p{t} AS (
      SELECT query_id, doc_id, rel, cv, maxsim,
             0.5 * rel - 0.5 * maxsim AS mmr FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id
          ORDER BY (0.5 * rel - 0.5 * maxsim) DESC, doc_id
        ) AS rn FROM s{t - 1}
      ) t WHERE rn = 1
    )"""
        )
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT query_id, doc_id, rel AS score, mmr AS mmr_score, "
        f"{t} AS mmr_rank FROM p{t}"
        for t in range(1, _MMR_K + 1)
    )
    return ",".join(parts) + "\n    " + selects


@query(
    "mmr_rerank_topk",
    oracle=_mmr_oracle(),
    survey="ext:rerank (MMR diversified re-ranking, Carbonell & Goldstein 1998; operators/rerank.py)",
)
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 (lam=0.5) over each query's exact top-20
    cosine candidates, queries vec_id<8. The greedy selection is one
    groupBy(query_id) aggregate fold over the |Q|x20 candidate frame —
    the corpus never re-enters after candidate generation
    (operators/rerank.py mmr_rerank). round_digits=9 applies the
    engine-portability rounding to each pairwise similarity before it
    enters the running max, which is what lets DuckDB reproduce the
    greedy selection, mmr scores, and ranks exactly."""
    from ..checkpoint import pin
    from ..operators.rerank import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8)
    cands = (
        # the exact_topk front door: at the fixture shape (dim 64 x 8
        # queries) it dispatches to the fold — same rounded sims the
        # oracle reproduces — and a wide-embedding corpus would get the
        # Arrow/BLAS path without touching this query
        exact_topk(emb, qs, k=20, n_queries=8)
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("vec"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("cosine_sim").alias("score"),
            "vec",
        )
        # lazy lineage cut on the |Q|*k candidate frame: generation
        # references embeddings through three distinct subtrees (corpus
        # scan, query filter, neighbor-vec fetch); without the cut every
        # action on the returned frame re-runs all three (the r13
        # driver-loop version pinned here eagerly — the aggregate rework
        # keeps the cut but lets the query's own action materialize it,
        # no dedicated job)
        .transform(pin, eager=False)
    )
    return mmr_rerank(cands, k=_MMR_K, lam=0.5, round_digits=9)


# ---------------------------------------------------------------------------
# maxsim_token_topk (r14 promotion candidate — declared in COVERAGE.md;
# NOT yet registered, the 50-cap registry is full): exact multi-vector
# late-interaction retrieval over token bags sliced deterministically
# from the embeddings fixture (4 contiguous 16-dim token vectors per
# 64-dim row — both engines derive identical bags from the same
# parquet). The oracle re-derives the FULL MaxSim rule in DuckDB list
# algebra: per-token L2 normalization with degenerate-token drop, per
# query token the max dot over doc tokens (list_dot_product is
# bit-identical to the engine's ordered fold), 9dp-rounded ordered sum,
# min-id tie-break top-k.
_MV_N_TOK, _MV_TOK_DIM = 4, 16

_MV_SLICES = ", ".join(
    f"v[{i * _MV_TOK_DIM + 1}:{(i + 1) * _MV_TOK_DIM}]"
    for i in range(_MV_N_TOK)
)

MAXSIM_TOKEN_TOPK_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    unit AS (
      SELECT vec_id,
             list_filter(list_transform([{_MV_SLICES}], t ->
               CASE WHEN list_dot_product(t, t) > 0
                    THEN list_transform(t, x -> x / sqrt(list_dot_product(t, t)))
               END), t -> t IS NOT NULL) AS toks
      FROM e
    ),
    q AS (SELECT vec_id AS query_id, toks AS qtoks FROM unit
          WHERE vec_id < 10 AND len(toks) > 0),
    c AS (SELECT vec_id AS neighbor_id, toks AS dtoks FROM unit
          WHERE len(toks) > 0),
    scored AS (
      SELECT query_id, neighbor_id,
             round(list_sum(list_transform(qtoks, t ->
               round(list_max(list_transform(dtoks, u ->
                 list_dot_product(t, u))), 9))), 9) AS maxsim_score
      FROM c, q WHERE neighbor_id <> query_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY maxsim_score DESC, neighbor_id)
                  AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, maxsim_score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """


@query(
    "maxsim_token_topk",
    oracle=MAXSIM_TOKEN_TOPK_ORACLE,
    survey="ext:similarity (multi-vector late interaction / ColBERT MaxSim; "
    "operators/multivector.py — promoted r14 per the staged queue)",
)
def maxsim_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ColBERT-style MaxSim top-5 for the first ten token bags
    against the whole corpus — (query_id, neighbor_id, maxsim_score,
    rank). Scale shape: broadcast queries x one corpus scan, the nested
    max/sum fold entirely in JVM higher-order functions, top-k window;
    the approximate path is operators/multivector.py token_ivf_candidates
    -> maxsim_rerank."""
    from ..operators.multivector import maxsim_topk

    emb = load_table(spark, sf_dir, "embeddings")
    toks = F.array(
        *[
            F.slice(F.col("embedding"), i * _MV_TOK_DIM + 1, _MV_TOK_DIM)
            for i in range(_MV_N_TOK)
        ]
    )
    mv = emb.select(F.col("vec_id").alias("doc_id"), toks.alias("token_vecs"))
    return maxsim_topk(mv, mv.filter(F.col("doc_id") < 10), k=5)
