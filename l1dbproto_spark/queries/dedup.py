"""Deduplication queries over documents (training-data pipeline extension):
exact hash dedup, n-gram Jaccard near-dup, MinHash signatures + LSH candidate
pairs, SimHash fingerprints. Builders in operators/dedup.py; everything here
is oracle-checked against DuckDB using the engine-portable md5-derived hash
(functions/hashing.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    doc_shingle_sets,
    exact_dedup_groups,
    jaccard_pairs_from_sets,
    minhash_band_buckets,
    minhash_candidate_pairs,
    minhash_signatures,
    shingle_jaccard_pairs,  # noqa: F401  (exploded-input variant, re-exported)
    shingle_rows,
    simhash,
    word_shingles,
)
from ..sources.catalog import load_table
from . import query

# Shared DuckDB CTE: normalized words and distinct word-3-gram shingles,
# mirroring operators.dedup.normalize_text/word_shingles exactly.
_SHINGLES_CTE = r"""
docs AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM docs, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS t(i)
)
"""

_MH_BASE = "(CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) % 2147483647)"


@query(
    "dedup_exact",
    oracle=r"""
    SELECT
      md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
      MIN(doc_id) AS keep_doc_id,
      COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    survey="ext:dedup (exact); U1",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash-groupBy on normalized text."""
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) AS jaccard
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.8
    """,
    survey="ext:dedup (n-gram Jaccard)",
    headline=True,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard >= 0.8 via the
    inverted-index (sub-quadratic: only docs sharing a shingle are paired);
    per-doc counts ride inside the postings, so the whole plan is 3
    exchanges with no count-table joins."""
    sets = doc_shingle_sets(load_table(spark, sf_dir, "documents"), n=3)
    return jaccard_pairs_from_sets(sets, min_jaccard=0.8)


def _minhash_oracle_sig_cte(k: int = 8) -> str:
    from ..operators.dedup import minhash_params

    mins = ",\n      ".join(
        f"MIN(({_MH_BASE} * {a} + {b}) % 2147483647) AS mh{i}"
        for i, (a, b) in enumerate(minhash_params(k))
    )
    return f"""
    sig AS (
      SELECT doc_id,
      {mins}
      FROM sh GROUP BY doc_id
    )"""


def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-permutation MinHash signature per document (salted portable hashes,
    k map-side min-aggregations in one shuffle). Not separately registered:
    the full signature computation is embedded (and therefore verified) in
    the ``minhash_lsh_candidates`` oracle's sig CTE."""
    return minhash_signatures(
        shingle_rows(load_table(spark, sf_dir, "documents"), n=3), k=8
    )


def _band_union_sql(bands: int = 4, rows: int = 2) -> str:
    parts = []
    for band in range(bands):
        cols = ", ".join(
            f"CAST(mh{band * rows + r} AS VARCHAR)" for r in range(rows)
        )
        parts.append(
            f"SELECT doc_id, {band} AS band, md5(concat_ws(',', {cols})) AS bucket FROM sig"
        )
    return " UNION ALL ".join(parts)


@query(
    "minhash_lsh_candidates",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_minhash_oracle_sig_cte(8)},
    bands AS ({_band_union_sql(4, 2)})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
    survey="ext:dedup (MinHash+LSH banding)",
    headline=True,
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: 4 bands x 2 rows over the MinHash signature;
    pairs sharing any band bucket. The banding join is the sub-quadratic
    scale path for near-dup detection on a 100 TB corpus."""
    sig = minhash_signatures(
        shingle_rows(load_table(spark, sf_dir, "documents"), n=3), k=8
    )
    return minhash_candidate_pairs(minhash_band_buckets(sig, bands=4, rows_per_band=2))


_JACCARD_PAIRS_CTE = f"""
    {_SHINGLES_CTE},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN cnt ca ON ca.doc_id = doc_a
      JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.8
    )
"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    {_JACCARD_PAIRS_CTE},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM jac
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM jac
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS node, least(u, MIN(v)) AS component
    FROM reach GROUP BY u
    """,
    survey="ext:dedup (connected-components clustering; operators/graph.py)",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the Jaccard>=0.8 pair
    graph, canonical doc = min id (iterative min-label propagation; the
    oracle computes the same components with a recursive CTE)."""
    from ..operators.graph import connected_components

    sets = doc_shingle_sets(load_table(spark, sf_dir, "documents"), n=3)
    pairs = jaccard_pairs_from_sets(sets, min_jaccard=0.8)
    return connected_components(pairs)


# Shared DuckDB CTE chain computing the 60-bit SimHash per document —
# mirrors operators.dedup.simhash exactly (used by both simhash queries).
_SIMHASH_SIG_CTE = r"""
    docs AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
      FROM documents
    ),
    wf AS (
      SELECT doc_id, word, COUNT(*) AS freq
      FROM (SELECT doc_id, unnest(w) AS word FROM docs)
      GROUP BY 1, 2
    ),
    wh AS (
      SELECT doc_id, freq,
             CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS whash
      FROM wf
    ),
    votes AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN (whash >> bit) & 1 = 1 THEN freq ELSE -freq END) AS vote_sum
      FROM wh, unnest(range(60)) AS t(bit)
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote_sum > 0 THEN (CAST(1 AS BIGINT) << bit)
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
      FROM votes
      GROUP BY doc_id
    )
"""


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (frequency-weighted bit votes).

    De-registered r5 (slot went to dsir_log_weights): the registered
    simhash_near_dup_pairs query recomputes this exact table as its
    candidate-generation prefix, so the fingerprint formula stays under
    the driver's hard signal transitively; the direct oracle lives in
    tests/test_unregistered_batteries.py."""
    return simhash(load_table(spark, sf_dir, "documents"))


@query(
    "simhash_near_dup_pairs",
    oracle=f"""
    WITH {_SIMHASH_SIG_CTE},
    blocks AS (
      SELECT doc_id, simhash, CAST(i AS INT) AS block,
             (simhash >> CAST(15 * i AS INT)) & 32767 AS val
      FROM sim, unnest(range(4)) AS t(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.simhash AS ha, b.simhash AS hb
      FROM blocks a
      JOIN blocks b ON a.block = b.block AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= 3
    """,
    survey="ext:dedup (SimHash Hamming-distance retrieval via block-permutation banding)",
)
def simhash_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs within 3 bits of SimHash: 4 x 15-bit block banding
    generates candidates (pigeonhole: <=3 differing bits -> >=1 identical
    block), exact bit_count(xor) verifies — sub-quadratic retrieval, the
    missing half of the SimHash family flagged in round 1."""
    from ..operators.dedup import simhash_near_dup_pairs

    fps = simhash(load_table(spark, sf_dir, "documents"))
    return simhash_near_dup_pairs(fps, max_bits=3)


@query(
    "contamination_report",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    esh AS (
      SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 50 = 0
    ),
    esz AS (SELECT eval_id, COUNT(*) AS eval_ngrams FROM esh GROUP BY 1),
    shared AS (
      SELECT c.doc_id, e.eval_id, COUNT(*) AS n_shared
      FROM sh c JOIN esh e USING (shingle)
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT doc_id, eval_id, n_shared, eval_ngrams,
           CAST(n_shared AS DOUBLE) / eval_ngrams AS contamination
    FROM shared JOIN esz USING (eval_id)
    """,
    survey="ext:contamination (n-gram benchmark-overlap report; GPT-3/Gopher decontamination)",
)
def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-vs-eval n-gram contamination (operators/contamination.py):
    eval set = every 50th document, word 3-grams, pairs sharing >= 2
    distinct shingles. The eval shingle set is broadcast — the corpus side
    is scanned, never shuffled for the join. Because this demo carves the
    eval set out of the corpus itself, the eval index is built by
    FILTERING the corpus shingle stream (identical subtree → the runtime
    skips the duplicate shingle stages) instead of re-shingling a second
    scan; a production eval set is a separate tiny table and builds its
    index directly."""
    from ..operators.contamination import EvalIndex, ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, 3)
    esh = sh.filter(F.col("doc_id") % 50 == 0).withColumnRenamed(
        "doc_id", "eval_id"
    )
    sizes = esh.groupBy("eval_id").agg(F.count(F.lit(1)).alias("eval_ngrams"))
    index = EvalIndex(shingles=esh, sizes=sizes)
    return ngram_contamination(docs, n=3, min_overlap=2, index=index)


# Driver round 11: dedup_corpus_lines rotated out of the 50-slot registry
# (slot to the round-10 components: weighted_topk_sample / bfs_distances /
# csv_ingest_quarantine) — the C4/CCNet line-cleaning family keeps this
# SAME oracle in-suite (tests/test_unregistered_batteries.py, driver-grade
# compare) plus the c4 operator pytest coverage.
DEDUP_CORPUS_LINES_ORACLE = """
    WITH injected AS (
      SELECT doc_id,
             'Accept our cookies to continue reading.' || chr(10) ||
             replace(text, '. ', '.' || chr(10)) AS text
      FROM documents
    ),
    split AS (
      SELECT doc_id, string_split(text, chr(10)) AS parts FROM injected
    ),
    lines AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS lidx, parts[i] AS line
      FROM split, unnest(range(1, len(parts) + 1)) AS t(i)
    ),
    content AS (
      SELECT doc_id, lidx, md5(trim(line)) AS h FROM lines
      WHERE len(trim(line)) > 0
    ),
    dup AS (
      SELECT h FROM content GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    ranked AS (
      SELECT c.doc_id, c.lidx,
             ROW_NUMBER() OVER (PARTITION BY c.h ORDER BY c.doc_id, c.lidx)
               AS rn
      FROM content c JOIN dup USING (h)
    ),
    doomed AS (SELECT doc_id, lidx FROM ranked WHERE rn > 1),
    surv AS (
      SELECT l.doc_id,
             string_agg(l.line, chr(10) ORDER BY l.lidx) AS new_text
      FROM lines l
      LEFT JOIN doomed d ON l.doc_id = d.doc_id AND l.lidx = d.lidx
      WHERE d.doc_id IS NULL
      GROUP BY l.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id IN (SELECT doc_id FROM doomed)
                THEN coalesce(s.new_text, '')
                ELSE d.text END AS text
    FROM injected d LEFT JOIN surv s USING (doc_id)
"""


def dedup_corpus_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level LINE dedup (operators/c4.py dedup_corpus_lines —
    CCNet/RefinedWeb boilerplate removal, keep_first rule): a recurring
    boilerplate line plus sentence-per-line structure is injected over the
    documents fixture (literal replace, engine-portable) so the rule has
    real duplicated lines to remove; the corpus-first occurrence survives,
    every later one is stripped, untouched docs pass through verbatim.
    DuckDB re-derives the full rule: line explode, trimmed-md5 line
    identity, >= 2 distinct docs, ROW_NUMBER-first winner, per-doc
    reassembly in line order."""
    from ..operators.c4 import dedup_corpus_lines as _lines

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("Accept our cookies to continue reading.\n"),
            F.replace(F.col("text"), F.lit(". "), F.lit(".\n")),
        ).alias("text"),
    )
    return _lines(docs)
