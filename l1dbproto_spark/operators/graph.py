"""Iterative graph operators: connected components for dedup clustering.

Near-dup pairs (from Jaccard / MinHash / embedding similarity) form an
undirected graph; the dedup *clusters* are its connected components, and the
canonical document of each cluster is the minimum doc id. Implemented as
driver-looped min-label propagation — each iteration is one join + aggregate,
converging in O(diameter) rounds (dedup clusters are tiny: diameter 1-3).

This is the one operator family where the driver loop is idiomatic even at
scale (GraphX/GraphFrames do the same under the hood); each round is a full
distributed job, the driver only checks the convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..checkpoint import pin


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star step (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond"): for every node x, connect each STRICTLY LARGER
    neighbor to the minimum of x's closed neighborhood.

    ``e`` is orientation-canonical (every row has ``u > v``); the output
    keeps that invariant (each emitted edge is ``(y, m)`` with
    ``m <= x < y``). Exactly ONE row is emitted per input row — the
    direction row whose far endpoint is larger — so the step never grows
    the frame, and duplicates are tolerated throughout (the min is
    multiset-insensitive; the per-batch dedup collapses them). Plan
    shape: one union (no shuffle), one unordered min window over the
    node key (one exchange, no sort, no join)."""
    nbrs = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        nbrs.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star step: key every edge at its LARGER endpoint x and
    connect x and all its (smaller) neighbors to the smallest of them.

    Input/output are orientation-canonical (``u > v``). Each row emits
    the pair ``{(v, m), (u, m)}`` — the reducer-level ``(x, m)`` of the
    paper is emitted once per row instead of once per group and the
    self-loop ``(m, m)`` is dropped by the filter; the batch-end dedup
    collapses the copies. Same single-exchange shape as large-star."""
    w = Window.partitionBy("u")
    pair = F.array(
        F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
        F.struct(F.col("u").alias("a"), F.col("m").alias("b")),
    )
    return (
        e.withColumn("m", F.min("v").over(w))
        .select(F.explode(pair).alias("s"))
        .select(F.col("s.a").alias("u"), F.col("s.b").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _star_rounds(
    cur: DataFrame, max_iterations: int, unroll: int
) -> DataFrame:
    """The large-star/small-star fixpoint loop over an ALREADY
    orientation-canonical edge frame (every row ``u > v``, no self-loops;
    duplicates tolerated). Shared by :func:`connected_components_star`
    and the auto dispatch in :func:`connected_components`, which seeds it
    from its own pinned undirected frame instead of re-scanning the
    input."""
    if unroll < 1:
        raise ValueError("unroll must be >= 1")
    id_type = cur.schema["v"].dataType
    rounds = 0
    while rounds < max_iterations:
        batch = cur
        for _ in range(min(unroll, max_iterations - rounds)):
            batch = _small_star(_large_star(batch))
            rounds += 1
        batch = batch.transform(pin, eager=False)
        # star-form probe: one pass (explode both endpoint roles), one
        # groupBy(node), one scalar aggregate — materializes the pin
        roles = batch.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("u").alias("node"),
                        F.col("v").alias("nbr"),
                        F.lit(1).alias("l"),
                        F.lit(0).alias("r"),
                    ),
                    F.struct(
                        F.col("v").alias("node"),
                        F.lit(None).cast(id_type).alias("nbr"),
                        F.lit(0).alias("l"),
                        F.lit(1).alias("r"),
                    ),
                )
            ).alias("s")
        ).select("s.*")
        probe = (
            roles.groupBy("node")
            .agg(
                F.max("l").alias("l"),
                F.max("r").alias("r"),
                F.countDistinct("nbr").alias("nv"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_nodes"),
                F.max(F.col("l") * F.col("r")).alias("both"),
                F.max("nv").alias("max_nbrs"),
            )
            .head()
        )
        cur = batch
        if probe["n_nodes"] == 0 or (
            probe["both"] == 0 and probe["max_nbrs"] <= 1
        ):
            # batch is disjoint stars: leaves = (u, v) collapsed per u
            # (each leaf has ONE distinct neighbor — min collapses the
            # duplicate rows), centers label themselves
            leaves = batch.groupBy("u").agg(F.min("v").alias("component"))
            return leaves.select(
                F.col("u").alias("node"), "component"
            ).unionAll(
                batch.select(F.col("v").alias("node"))
                .distinct()
                .select("node", F.col("node").alias("component"))
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iterations} "
        "large-star/small-star rounds; raise max_iterations"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
    unroll: int = 2,
) -> DataFrame:
    """(node, component) by alternating large-star / small-star edge
    contraction (Kiveris et al. 2014) — the scale-oriented ALTERNATIVE to
    the shipped :func:`connected_components`, kept equivalence-tested
    (tests/test_cc_star.py pins both arms against a Python union-find on
    random graphs) but NOT the default. Same contract: component = min
    reachable node id, isolated nodes absent, any orderable id type.

    Why it is not the default (r15 measured decision — the full ledger
    lives in :func:`connected_components`): on the bench dedup graphs the
    min-label rounds run as BROADCAST joins (the label frame is small →
    zero shuffles per round), while each star step is a window over the
    edge key — an unavoidable exchange per step — so star measured
    SLOWER at both local SFs (interleaved A/B, CC isolated on pinned
    pairs: 0.94 s vs 1.19 s @ sf0.1, 0.53 s vs 0.97 s @ sf0.01) and only
    won on deep chains (60-node chain: 2.19 s vs 2.52 s). Its regime is
    the opposite one: edge frames too large for the label side to
    broadcast, where a min-label round degrades to two sort-merge joins
    of a never-shrinking frame while a star round stays two windows over
    a frame that CONTRACTS toward one edge per non-min node.

    Each star step references its input exactly once, so ``unroll``
    rounds chain into ONE materialized job without subtree duplication
    (the same single-reference unrolling core_numbers uses; extra star
    steps past the fixpoint are identity, so any unroll factor converges
    to the same answer).

    Convergence probe: a batch is converged when its (multiset) edge
    output is STAR-FORM — every left endpoint has exactly one distinct
    neighbor and no node appears as both a left and a right endpoint —
    tested with one explode + groupBy(node) + scalar aggregate that also
    materializes the batch's lazy pin (one job per batch, no comparison
    against the previous batch and no confirm round: star-form IS the
    fixpoint, since disjoint stars are identity under both steps and,
    by Kiveris et al.'s termination theorem, every fixpoint is
    star-form). At star-form the center of each star is the component
    minimum: node sets and connectivity are preserved by both steps
    (paper Lemmas), edges always point larger -> smaller, so a
    component's minimum can never be a leaf — it is the (unique)
    center. Raises past ``max_iterations`` full rounds instead of
    returning wrong clusters (the paper's bound is O(log^2 n) rounds,
    measured 1-4 on the bench graphs incl. a 59-diameter chain).

    Self-loop rows are ignored as edges, so a node appearing ONLY in
    self-loops is absent from the output — identical to
    :func:`connected_components` (both arms treat such a node as
    isolated; pinned by test)."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # orientation-canonical seed (u > v, no self-loops); duplicates are
    # tolerated by the star steps (min is multiset-insensitive), so no
    # seed-side distinct job — the output groupBy collapses them at the end
    cur = fwd.filter(F.col("u") != F.col("v")).select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    return _star_rounds(cur, max_iterations, unroll)


#: Auto-dispatch threshold: integral-keyed graphs with at least this many
#: edge-bearing nodes run the star-contraction arm. Env-overridable so a
#: deployment can move the crossover without a code change; the default
#: sits above every bench graph (hundreds to ~5k nodes, where min-label's
#: broadcast rounds win or tie) and below the smallest measured star win
#: (random supercritical graphs: star 2.9 s vs min-label 5.0 s at 3.7k
#: nodes, 2.7 vs 4.4 at 7.3k, 3.2 vs 6.0 at 15k, 10.5 vs 23.5 at 367k —
#: tools/ab_cc.py / OPTIMIZATION_r15.md). The asymmetry is safe: above
#: the threshold star never measured worse than parity, below it the
#: graphs are small enough that either arm finishes in ~1 s.
_STAR_MIN_NODES_ENV = "SPARK_GRAFT_CC_STAR_MIN_NODES"
_STAR_MIN_NODES_DEFAULT = 10_000


def _star_min_nodes() -> int:
    import os

    return int(os.environ.get(_STAR_MIN_NODES_ENV, _STAR_MIN_NODES_DEFAULT))


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
    algorithm: str = "auto",
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    ``edges`` is undirected (each pair once). Isolated nodes don't appear —
    callers union them back with component = own id if needed.

    Each round does a neighbor-min step AND a pointer-jumping shortcut
    (label <- label of label), so convergence takes O(log diameter)
    rounds, not O(diameter): plain one-hop propagation needed a round
    per hop, so a duplicate CHAIN longer than max_iterations silently
    exited with wrong, non-converged labels (review find — templated
    page series form exactly such chains). 20 doubling rounds cover any
    diameter up to ~2^20; if the graph still hasn't converged the loop
    RAISES instead of returning wrong clusters.

    Convergence probe (r14): every label update is ``least(...)`` of the
    old label, so labels are monotonically non-increasing and, for
    integral node ids, the label SUM is an exact change detector —
    "sum unchanged" == "no label changed". The probe is one scalar
    aggregation over the round's pinned frame (summed as decimal(38,0):
    node ids may be full-range 64-bit hashes, and a wrapped long sum
    could in principle collide) instead of the previous new-vs-old
    join + count; if the decimal sum itself overflows to NULL (non-ANSI)
    the round falls back to the exact join-based change count rather
    than comparing None == None (r14 advice item 3). Non-numeric ids
    (entity resolution clusters string keys) keep the join-based change
    count — a string sum has no monotone total. Either way the round's
    pin is LAZY with the probe as its materializing action — one job per
    round where pin + probe was two.

    Algorithm dispatch (r15, VERDICT item 1): the large-star/small-star
    contraction of Kiveris et al. 2014 (:func:`connected_components_star`,
    equivalence-pinned by tests/test_cc_star.py) was built and benched
    head-to-head, and the two arms win in DISJOINT regimes:

    * bench-sized graphs (hundreds to ~2k nodes, both local SFs): every
      min-label round's joins broadcast the label frame — zero exchanges
      per round — while every star step pays a window exchange. Isolated
      CC on pinned jaccard pairs: min-label 0.94 s vs star 1.19 s @
      sf0.1, 0.53 vs 0.97 @ sf0.01; parity on 200x10 cliques.
    * large graphs (same host, synthetic supercritical random graphs):
      the label frame stops broadcasting and min-label degrades to
      repeated sort-merge joins of a never-shrinking frame, while star's
      edge frame CONTRACTS — 500k edges / 367k nodes: min-label 23.5 s
      (117 jobs) vs star 10.5 s (28 jobs); 2M edges / 1.47M nodes:
      68.5 s vs 19.5 s (3.5x).

    ``algorithm="auto"`` (default) therefore dispatches integral-keyed
    graphs to the star arm when the seed aggregation — the SAME single
    job that seeds the label-sum probe, now also counting label rows —
    sees at least ``$SPARK_GRAFT_CC_STAR_MIN_NODES`` (default 10k)
    edge-bearing nodes; the star seed reuses this function's pinned
    undirected frame, so the dispatch costs one wasted seed aggregation
    at worst and nothing below the threshold. String-keyed graphs (no
    seed aggregation exists on that path, and real ones are entity-
    resolution-sized) stay min-label unless ``algorithm="star"`` is
    passed explicitly; ``algorithm="minlabel"`` pins the label loop.

    Self-loop rows are ignored as edges, so a node appearing ONLY in
    self-loops is absent from the output under every algorithm (r15
    normalization — the arms previously disagreed on this out-of-contract
    input; pinned by test)."""
    if algorithm not in ("auto", "minlabel", "star"):
        raise ValueError(
            f"algorithm must be auto|minlabel|star, got {algorithm!r}"
        )
    if algorithm == "star":
        return connected_components_star(edges, src, dst)
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    undirected = (
        fwd.unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .transform(pin, eager=False)
    )
    # initial label: min neighbor (or self) — then propagate mins
    labels = (
        undirected.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .select(F.col("u").alias("node"), "label")
        .transform(pin, eager=False)
    )
    integral_ids = labels.schema["label"].dataType.simpleString() in (
        "bigint",
        "int",
        "smallint",
        "tinyint",
    )
    label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    if integral_ids:
        # seed the probe from the initial labels; the one job here also
        # materializes the undirected-edges and initial-labels pins, and
        # its node count is the auto-dispatch size probe (free: same job)
        seed = labels.agg(
            label_sum.alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        prev_sum = seed["s"]
        if algorithm == "auto" and seed["n"] >= _star_min_nodes():
            # large integral-keyed graph: hand the already-pinned
            # undirected frame to the star loop (filter u > v restores
            # the orientation-canonical seed without re-scanning edges)
            return _star_rounds(
                undirected.filter(F.col("u") > F.col("v")),
                max_iterations=25,
                unroll=2,
            )
    for _ in range(max_iterations):
        # candidate: min of own label and neighbors' labels
        neighbor_labels = (
            undirected.join(
                labels.withColumnRenamed("node", "v").withColumnRenamed(
                    "label", "nlabel"
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nlabel").alias("nmin"))
            .select(F.col("u").alias("node"), "nmin")
        )
        hooked = (
            labels.join(neighbor_labels, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        # pointer jumping: label <- label's own label (path doubling)
        jump = hooked.select(
            F.col("node").alias("label"), F.col("label").alias("jlabel")
        )
        new_labels = (
            hooked.join(jump, "label", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("jlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        # lazy pin + probe: the probe is the action that materializes
        # the round's checkpoint — one job, not two
        new_labels = new_labels.transform(pin, eager=False)
        if integral_ids:
            s = new_labels.agg(label_sum).collect()[0][0]
            if s is None or prev_sum is None:
                # decimal(38,0) overflowed to NULL (non-ANSI) — a
                # None == None comparison would silently declare
                # convergence with wrong labels (r14 advice item 3);
                # fall back to the exact join-based change count
                converged = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "node")
                    .filter(F.col("n.label") != F.col("o.label"))
                    .count()
                    == 0
                )
            else:
                converged = s == prev_sum
            prev_sum = s
        else:
            converged = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
                == 0
            )
        labels = new_labels
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "doubling rounds (graph diameter beyond ~2^"
            f"{max_iterations}); raise max_iterations"
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def canonical_rank(score_col: str, id_col: str):
    """The engine's NULL-safe canonical ranking struct, shared by
    resolve_canonicals and clean_corpus's keep-best stages: scored beats
    unscored, then score, score ties to the SMALLEST id (max_by over
    this struct)."""
    return F.struct(
        F.col(score_col).isNotNull().alias("has"),
        F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf"))).alias(
            "s"
        ),
        (-F.col(id_col)).alias("ni"),
    )


def canonical_rank_inv(score_col: str, id_col: str):
    """min_by twin of :func:`canonical_rank` for NON-NUMERIC ids (entity
    resolution clusters string keys — names, URLs — which the max_by
    struct can't tie-break because ``-id`` needs a numeric). Same
    semantics (scored beats unscored, then max score, ties to smallest
    id) expressed as the smallest struct: invert the two score fields,
    keep the id ascending. Pinned equal to canonical_rank on numeric ids
    by test."""
    return F.struct(
        F.col(score_col).isNull().alias("no_score"),
        (-F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf")))).alias(
            "ns"
        ),
        F.col(id_col).alias("id"),
    )


def resolve_canonicals(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware canonical selection over dedup clusters — keep the
    BEST duplicate, not the smallest id.

    The engine's dedup stages default to canonical = min id (cheap,
    deterministic, order-free), but practitioners usually keep the
    highest-quality member of each duplicate cluster (longest text,
    best classifier score, freshest crawl — whatever ``score_col``
    encodes). Input: ``components`` from :func:`connected_components`
    ((node, component)); ``scores`` keyed by ``id_col``. Output one row
    per clustered document:

    ``id_col, component, canonical_id, is_canonical``

    with ``canonical_id`` = the component's max-score member, score ties
    to the SMALLEST id (so the default behavior is recovered by a
    constant score). Documents missing from ``scores`` score NULL and
    never win unless the whole cluster is unscored, in which case min id
    wins (min_by over the inverted rank struct treats NULL score as
    lowest; ids may be any orderable type, including strings).

    One equi-join on id + one aggregation on component — both uniform
    keys (cluster sizes are bounded by the near-dup rule), nothing
    iterative; composes with any scorer in operators/quality.py,
    classifier.py, or a plain length column."""
    nodes = components.select(
        F.col("node").alias(id_col), "component"
    ).join(
        scores.select(
            F.col(id_col), F.col(score_col).cast("double").alias("_score")
        ),
        id_col,
        "left",
    )
    rank = canonical_rank_inv("_score", id_col)
    winners = nodes.groupBy("component").agg(
        F.min_by(F.col(id_col), rank).alias("canonical_id")
    )
    return (
        nodes.join(winners, "component")
        .select(
            F.col(id_col),
            "component",
            "canonical_id",
            (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    iterations: int = 10,
    tol: float | None = None,
    dedup_edges: bool = True,
    personalization: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(node, rank) by power iteration with dangling-mass redistribution —
    graph centrality for the corpus graph family (link/citation authority as
    a quality prior; the same edge frames the dedup pair generators emit).

    Standard formulation (Page et al. 1999): each round every node
    distributes rank/out_degree along its out-edges; nodes without
    out-edges (dangling) spread their whole rank uniformly; then
    rank = (1-d)/N + d * (in_mass + dangling_mass/N).

    ``dedup_edges`` (default True, matching the simple-graph convention of
    the dedup pair frames this composes with) collapses parallel edges;
    with ``dedup_edges=False`` the walk is MULTIGRAPH-weighted — an edge
    repeated m times carries m shares of its source's rank (out-degree
    counts multiplicity), the right semantics for repeated link/citation
    events.

    Scale shape: two uniform shuffles per round (rank join keyed on src —
    the edge side is pinned once, degree attached — and the in-mass
    groupBy on dst, map-side combined so high-in-degree hubs cost partials,
    not a hot reducer). The driver touches only bounded scalars per round
    (the 1-row dangling aggregate and the optional L1 delta), and every
    round's rank frame is pinned exactly like `connected_components` —
    O(1) lineage regardless of iteration count.

    ``tol``: if set, stop early when the L1 rank delta falls below it
    (costs one extra bounded aggregate per round).

    ``personalization``: seed frame (``node`` column, optional ``weight``)
    turning this into PERSONALIZED PageRank (Haveliwala 2002): teleport
    and dangling mass flow to the seed distribution instead of uniformly
    — the quality-propagation-from-trusted-seeds prior (curated domains,
    verified authors) a corpus-curation pipeline scores link graphs
    with. The seed vector is normalized, joined once as a pinned column
    (one extra broadcast-sized join per round), and seeds absent from the
    edge list still receive their teleport mass. A uniform seed frame
    over all nodes reproduces standard PageRank bit-for-bit (pinned by
    test).

    ``weight_col``: real-valued edge weights (similarity scores, link
    counts) — each round a node's rank splits proportionally to its
    out-weights instead of uniformly. Weights must be positive (validated
    with one bounded probe, raising rather than silently dropping);
    parallel edges' weights ADD. Unit weights reproduce the unweighted
    walk bit-for-bit (pinned by test)."""
    if weight_col is not None:
        raw = edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight_col).cast("double").alias("_ew"),
        )
        e = raw.groupBy("src", "dst").agg(F.sum("_ew").alias("w"))
        if e.filter((F.col("w") <= 0) | F.col("w").isNull()).limit(1).count():
            raise ValueError("weight_col must be positive and non-null")
    else:
        raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        # edge weights: 1 per distinct edge (simple graph) or the
        # multiplicity (multigraph) — one uniform groupBy either way
        e = raw.groupBy("src", "dst").agg(
            (F.lit(1) if dedup_edges else F.count(F.lit(1))).cast("long").alias("w")
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if personalization is not None:
        # seeds outside the edge list still get teleport mass
        nodes = nodes.unionByName(
            personalization.select(F.col("node"))
        ).distinct()
    nodes = nodes.transform(pin, eager=True)
    n = nodes.count()  # bounded driver scalar (node count)
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.sum("w").alias("out_deg"))
    e_deg = e.join(deg, "src").transform(pin, eager=True)
    sinks = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).transform(pin, eager=True)

    if personalization is not None:
        w = (
            personalization.select(
                "node",
                (
                    F.col("weight").cast("double")
                    if "weight" in personalization.columns
                    else F.lit(1.0)
                ).alias("_w"),
            )
            .groupBy("node")
            .agg(F.sum("_w").alias("_w"))
        )
        total = w.agg(F.sum("_w")).collect()[0][0]
        if not total or total <= 0:
            raise ValueError("personalization weights must sum to > 0")
        pvec = (
            nodes.join(w, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("_w"), F.lit(0.0)) / F.lit(float(total))).alias(
                    "p"
                ),
            )
            .transform(pin, eager=True)
        )
    else:
        pvec = nodes.select("node", F.lit(1.0 / n).alias("p")).transform(
            pin, eager=True
        )

    ranks = pvec.select("node", F.col("p").alias("rank"))
    for _ in range(iterations):
        in_mass = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        dangling = (
            sinks.join(ranks, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )  # 1-row aggregate
        new_ranks = (
            pvec.join(in_mass, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("p")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.lit(dangling) * F.col("p")
                    )
                ).alias("rank"),
            )
            .transform(pin, eager=True)
        )
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank", "nr")
                .join(ranks, "node")
                .agg(F.sum(F.abs(F.col("nr") - F.col("rank"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    node_col: str = "node",
    max_hops: int = 20,
    directed: bool = False,
) -> DataFrame:
    """Hop distance from a SET of source nodes — multi-source BFS as
    iterative frontier expansion (the third member of the graph family
    next to connected_components and pagerank; answers "how far is every
    document from the seed set", e.g. dedup-cluster radius from the
    canonical, or link-graph distance from a trusted seed list).

    ``sources`` carries one column ``node_col``. Returns (node, dist)
    with ``dist`` = minimum number of edges to any source (0 for the
    sources themselves); unreachable nodes are absent — callers needing
    them attach ``coalesce(dist, lit(None))`` via a left join.

    Scale shape: each round is one equi-join frontier expansion + one
    anti-join against the visited set — both shuffles on the uniform node
    key; the frontier is pinned per round (O(1) lineage like pagerank's
    rank frames), and the loop exits as soon as a frontier comes back
    empty, so total work is O(edges within the reached radius), never
    max_hops * edges. Raises if the graph is still expanding at
    ``max_hops`` (silent truncation would mislabel distances).

    Pins are LAZY with the frontier count as the materializing action
    (r14): one job per hop — the count both answers "is the frontier
    empty" and checkpoints the frontier, and the visited-set union's
    checkpoint cascades into the NEXT hop's job — where eager pin +
    limit(1) probe + eager union pin was three jobs per hop."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    adj = (
        fwd
        if directed
        else fwd.unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    )
    adj = adj.transform(pin, eager=False)
    dist = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .transform(pin, eager=False)
    )
    frontier = dist.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            adj.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .transform(pin, eager=False)
        )
        if nxt.count() == 0:
            return dist
        dist = dist.unionByName(
            nxt.withColumn("dist", F.lit(hop).cast("long"))
        ).transform(pin, eager=False)
        frontier = nxt
    # still expanding at the cap: distances beyond max_hops would be
    # silently wrong, so refuse (same contract as connected_components)
    remaining = (
        adj.join(frontier.withColumnRenamed("node", "u"), "u")
        .select(F.col("v").alias("node"))
        .distinct()
        .join(dist.select("node"), "node", "left_anti")
        .limit(1)
        .count()
    )
    if remaining:
        raise RuntimeError(
            f"bfs_distances still expanding after {max_hops} hops; raise max_hops"
        )
    return dist


# ---------------------------------------------------------------------------
# Graph mining: triangles, clustering coefficient, k-core / coreness.
#
# The corpus graphs these run on (near-dup pair graphs from MinHash/SimHash,
# host/domain link graphs used as web-quality signals) are sparse but have
# heavy-tailed degree distributions, so every operator here is written
# around the standard skew defenses: degree-ordered edge orientation for
# triangles (Suri & Vassilvitskii, WWW 2011 — max oriented out-degree is
# O(sqrt(m)), so the wedge self-join cannot blow up on hub nodes) and the
# h-index fixpoint for coreness (Montresor, De Pellegrini & Miorandi,
# "Distributed k-Core Decomposition", 2011) whose per-round cost is one
# join + one per-node top-d aggregation.
# ---------------------------------------------------------------------------


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected simple-graph normal form: (u, v) with u < v, self-loops
    removed, duplicates and reversed duplicates collapsed. Every operator
    below starts here so callers may pass messy pair lists (e.g. near-dup
    pair output, which emits each pair once but in arbitrary order)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    return e.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()


def _degrees_canon(e: DataFrame) -> DataFrame:
    """(node, degree) for an ALREADY-canonical (u, v) edge frame — the
    internal form operators use on their pinned canonical edges, so the
    canonicalization distinct isn't re-planned per consumer."""
    ends = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, degree) over the canonicalized undirected graph."""
    return _degrees_canon(canonical_edges(edges, src, dst))


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Every triangle exactly once as (t1, t2, t3) ordered by the degree
    rank used for orientation.

    Scale shape: orient each edge from its lower-(degree, id) endpoint to
    the higher one, so a node's oriented out-neighborhood has at most
    O(sqrt(m)) members regardless of its real degree — the wedge self-join
    on the oriented source is therefore bounded even at hub nodes, and the
    closing check is a left-semi join back to the oriented edge set (three
    shuffles total: degree attach, wedge join, closing semi-join; no
    cartesian anywhere). The canonical edge list and the oriented edge set
    are pinned (checkpoint.pin) because each is referenced from multiple
    branches of the plan — without the lineage cut every branch would
    re-derive the edges from the raw input (for a derived graph that means
    re-running the edge-building join once per branch)."""
    e = canonical_edges(edges, src, dst).transform(pin, eager=True)
    deg = _degrees_canon(e)
    withdeg = (
        e.join(deg.select(F.col("node").alias("u"), F.col("degree").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("degree").alias("dv")), "v")
    )
    # orient low-rank -> high-rank; rank = (degree, id) is a total order
    lo_first = F.struct("du", "u") < F.struct("dv", "v")
    oriented = withdeg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).transform(pin, eager=True)
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = (
        x.join(y, F.col("x.a") == F.col("y.a"))
        .filter(
            F.struct(F.col("x.db"), F.col("x.b")) < F.struct(F.col("y.db"), F.col("y.b"))
        )
        .select(
            F.col("x.a").alias("t1"),
            F.col("x.b").alias("t2"),
            F.col("y.b").alias("t3"),
        )
    )
    closing = oriented.select(F.col("a").alias("t2"), F.col("b").alias("t3"))
    return wedges.join(closing, ["t2", "t3"], "left_semi")


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, triangles) — how many triangles each node participates in.
    Nodes in no triangle are omitted (join back to :func:`degrees` for the
    zero rows; :func:`clustering_coefficient` does exactly that)."""
    tri = triangles(edges, src, dst)
    corners = tri.select(
        F.explode(F.array("t1", "t2", "t3")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, degree, triangles, coefficient) with the local clustering
    coefficient 2T / (d(d-1)) — 0.0 for degree-1 nodes. A standard web-graph
    quality signal: template farms and link rings show near-1.0 coefficients
    while organic pages sit much lower."""
    deg = degrees(edges, src, dst)
    tri = triangle_counts(edges, src, dst)
    joined = deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
    )
    d = F.col("degree").cast("double")
    return joined.withColumn(
        "coefficient",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("triangles").cast("double") / (d * (d - 1.0)),
        ).otherwise(F.lit(0.0)),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Nodes of the k-core (maximal subgraph where every node has degree
    >= k within the subgraph), by iterative peeling: drop all nodes below
    degree k, drop their incident edges, repeat to fixpoint. Each round is
    one aggregation + two semi-joins; rounds are bounded by the longest
    peeling chain (raises past ``max_iterations`` rather than returning a
    non-converged subgraph, same contract as connected_components).

    Convergence probe: ONE edge count per round — the pre-peel count is
    last round's post-peel count (r14, VERDICT item 4: the first cut
    re-counted the pinned input every round, doubling the probe jobs for
    zero information)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = canonical_edges(edges, src, dst).transform(pin, eager=True)
    before = e.count()
    for _ in range(max_iterations):
        deg = _degrees_canon(e)  # e stays canonical through the peels
        keep = deg.filter(F.col("degree") >= k).select("node")
        kept = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .transform(pin, eager=True)
        )
        after = kept.count()
        e = kept
        if after == before:
            break
        if after == 0:
            break
        before = after
    else:
        raise RuntimeError(
            f"k_core({k}) still peeling after {max_iterations} rounds; "
            "raise max_iterations"
        )
    ends = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    return ends.distinct()


def _h_round(und: DataFrame, cur: DataFrame) -> DataFrame:
    """One lazy h-index application for ``core_numbers``: (node, core)
    over every node with an edge in ``und``.

    ``und`` is the (u, v) directed-both-ways edge frame, ``cur`` the
    current (node, core) estimates.

    h = max over distinct neighbor-estimate values v (descending) of
    min(v, count of neighbors with estimate >= v) — computed from
    per-(u, value) COUNTS, not a ranked scan of the adjacency: the
    groupBy(u, ne) partial-aggregates map-side, so a hub's rows are
    combined inside every map task and no single reducer ever sorts its
    full neighbor list (the r10 skew finding — the old row_number window
    sorted all neighbors of a hub in one task every round). The frame
    under the cumulative window is one row per (node, distinct estimate
    value): a planted 50k-leaf hub contributes 1-2 rows once its leaves'
    estimates settle, and for ANY graph with m edges the frame is
    <= the number of distinct current estimates <= ~2*sqrt(m) (D distinct
    degree values need 1+2+...+D <= 2m), versus O(degree) before.

    A further cap at the node's own round-start estimate (which would
    shrink the frame bound to the node's coreness) was built and
    MEASURED OUT: it never changes h — in the synchronous iteration
    h <= cur(u) <= any earlier estimate, and counts of values below the
    cap are unchanged — but fetching cap(u) costs a join per
    application, and on the bench co-purchase graph (round-count-bound,
    22 applications) the capped variant ran 11.2-13.8 s vs 5.8-7.1 s for
    this one, with or without AQE. The distinct-value bound above
    already removes the degree-sized task, which is the part that
    matters at 100x.

    In the synchronous iteration h is <= the node's current estimate and
    every node of the edge-derived graph has degree >= 1, so h covers
    the full node set — the returned frame IS the new estimate, no
    update join needed. ``cur`` is referenced exactly once, so ``unroll``
    chains stay single-evaluation."""
    from pyspark.sql import Window

    # cumulative neighbor count over DISTINCT estimate values, largest
    # first; one row per (u, value), so the per-node sort is O(distinct
    # estimate values), never O(degree) — values are distinct per u after
    # the groupBy, so no tie-break is needed.
    wcum = (
        Window.partitionBy("u")
        .orderBy(F.desc("ne"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        und.join(
            cur.select(F.col("node").alias("v"), F.col("core").alias("ne")),
            "v",
        )
        .groupBy("u", "ne")  # map-side partial agg absorbs hub skew
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("cum", F.sum("cnt").over(wcum))
        .select("u", F.least(F.col("ne"), F.col("cum")).alias("m"))
        .groupBy("u")
        .agg(F.max("m").alias("core"))
        .select(F.col("u").alias("node"), "core")
    )


def core_numbers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 100,
    frontier: bool = False,
    unroll: int = 2,
) -> DataFrame:
    """(node, core) — every node's coreness (the largest k for which it is
    in the k-core) in ONE fixpoint instead of a peel per k.

    Algorithm: the h-index iteration of Montresor et al. 2011 — start each
    estimate at the node's degree, then repeatedly replace it with the
    h-index of its neighbors' estimates (the largest h such that at least h
    neighbors currently estimate >= h). Estimates are monotonically
    non-increasing and converge exactly to the core numbers. Each round is
    one join (edges x estimates) plus a per-node aggregation of DISTINCT
    estimate values (see :func:`_h_round`): the groupBy(u, ne) has
    map-side partial aggregation, so a hub's adjacency is combined inside
    every map task and the shuffle carries O(map_tasks x distinct
    estimates) rows for it — never its full neighbor list in one reducer —
    and the frame the h-index cumulative window sorts per node is its
    distinct neighbor-estimate count (<= ~2*sqrt(m) for any graph), not
    its degree. Raises if not converged within ``max_iterations`` (real
    graphs converge in a few dozen rounds; bound documented in the
    paper).

    ``frontier=True`` adds changed-set pruning: a node's h-index can only
    drop when a NEIGHBOR's estimate dropped last round, so each round
    recomputes h only for nodes adjacent to the previous round's changed
    set (estimates are monotone, so skipped nodes keep provably-correct
    values). MEASURED tradeoff (tools/coreness_crossover.py, driver
    r10; x100 re-measured driver r11 with the aggregation-based round in
    fresh sessions — plain 38.5-39.0 s vs frontier 42.2 s, same verdict;
    the crossover TOOL's one-session sequential sweep overstates
    whichever size runs late, so same-size comparisons should come from
    fresh sessions): the pruning costs two extra semi-joins + a distinct
    + a pin per round AND forces unroll=1, which loses on this family of
    graphs at EVERY measured size — co-purchase graph x1/x10/x100 edges
    (33k/325k/3.25M): plain 10.8/13.8/39.5 s vs frontier
    12.1/22.4/45.3 s (r10 code; the r11 aggregation round measures at
    parity with these on the same host, old 40.6 vs new 39.0 at x100).
    Data volume alone never pays for the bookkeeping
    because the h-index fixpoint converges in a few rounds with LARGE
    frontiers (most nodes settle together, so little is skippable); the
    win requires a long SMALL-frontier convergence tail — many rounds
    in which only a residual region is still changing (slowly peeling
    cores / high-diameter structures) — not mere scale. Even an
    ENGINEERED tail (x100 graph + a 60-node path whose degree-1
    correction creeps one node per round: ~30 tail rounds, frontier
    size ~4) measured plain 44.7-50.3 s vs frontier 54.3 s locally:
    a tiny-frontier round still costs ~0.45 s of fixed local job
    overhead while a full 3.25M-edge round costs ~1 s, and plain's
    unroll=2 halves its materialized rounds. The flag pays only where
    a full round costs >> the fixed per-round overhead (true
    cluster-scale volumes). A frontier+unroll composition was built
    and measured WORSE (59/119 s at unroll 2/4): the partial
    application's update join references the chained frame twice, so
    unrolling re-evaluates the whole prior-application subtree — unlike
    plain h_of, whose output IS the new estimate (single reference).
    Default is the plain round; flip frontier on only after profiling
    shows the tail at volumes where data, not job count, dominates.

    ``unroll`` chains that many h-index applications into ONE pinned plan
    per materialized round (each application is a pure monotone map, and
    extra applications past the fixpoint are identity, so any unroll
    factor converges to the same exact answer). Fewer pins + convergence
    probes + job barriers for the same total shuffle work — the measured
    win on the bench co-purchase graph (whose cost is round-count-bound,
    not data-bound) is ~35%, and the local sweep (driver r10, same
    graph) reads 7.5 / 5.2 / 4.7 / 5.6 s at unroll 2/3/4/6. The default
    STAYS 2 despite 4 winning locally: up to unroll-1 applications past
    the fixpoint are wasted, and at data-dominated scale each waste is a
    FULL-graph join while the saving is only the per-round scalar probe
    + small-frame pin — raise it on round-count-bound (small/local)
    graphs, keep it low on 100 TB ones. unroll cannot skip frontier
    pruning's changed-set bookkeeping, so ``frontier=True`` forces
    unroll=1."""
    if unroll < 1:
        raise ValueError("unroll must be >= 1")
    if frontier:
        unroll = 1  # pruning needs the per-application changed set

    e = canonical_edges(edges, src, dst)
    lazy_pins = not frontier  # frontier's limit(1) probe would not
    # materialize every partition of a lazy checkpoint
    und = (
        e.select("u", "v")
        .unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .transform(pin, eager=not lazy_pins)
    )
    est = und.groupBy("u").agg(F.count(F.lit(1)).alias("core")).select(
        F.col("u").alias("node"), "core"
    ).transform(pin, eager=not lazy_pins)
    changed = est.select("node")  # round 1: every node may drop

    if not frontier:
        # plain rounds: the estimate sum is a monotone non-increasing
        # integer, so "sum unchanged" == "nothing changed" — an exact
        # convergence probe that is one scalar aggregation over the pinned
        # blocks instead of a change-detection join. Seeded from the
        # INITIAL degree estimates so a graph already at its fixpoint
        # converges inside the FIRST batch — the same contract as the old
        # per-round change detection: max_iterations bounds
        # h-applications, and a batch that changes nothing returns within
        # those applications, never raises. Pins are LAZY with the probe
        # as the materializing action (r14): one job per materialized
        # round (and one at seed time for und + est) where pin + probe
        # was two.
        prev_sum = est.agg(F.sum("core")).collect()[0][0]
        rounds = 0
        while rounds < max_iterations:
            cur = est
            for _ in range(min(unroll, max_iterations - rounds)):
                cur = _h_round(und, cur)
                rounds += 1
            est = cur.transform(pin, eager=False)
            s = est.agg(F.sum("core")).collect()[0][0]
            if s == prev_sum:
                return est
            prev_sum = s
        raise RuntimeError(
            f"core_numbers did not converge in {max_iterations} h-index rounds"
        )

    for _ in range(max_iterations):
        # frontier round: recompute h only for nodes adjacent to the last
        # round's changed set; everyone else keeps their (provably still
        # correct) estimate, so the h frame is PARTIAL and the update join
        # against the old estimates is required here.
        affected = (
            und.join(changed.withColumnRenamed("node", "v"), "v", "left_semi")
            .select(F.col("u").alias("node"))
            .distinct()
        )
        und_aff = und.join(
            affected.withColumnRenamed("node", "u"), "u", "left_semi"
        )
        # same aggregation-based h-index round, restricted to the affected
        # edge set.
        h = _h_round(und_aff, est).withColumnRenamed("core", "h")
        new_core = F.least(F.col("core"), F.coalesce(F.col("h"), F.col("core")))
        new_est = (
            est.join(h, "node", "left")
            .select(
                "node",
                new_core.alias("core"),
                (new_core < F.col("core")).alias("dropped"),
            )
            .transform(pin, eager=True)
        )
        changed = new_est.filter("dropped").select("node")
        est = new_est.select("node", "core")
        if changed.limit(1).count() == 0:
            return est
    raise RuntimeError(
        f"core_numbers did not converge in {max_iterations} h-index rounds"
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 10,
) -> DataFrame:
    """(node, label) community assignment by synchronous label propagation
    (Raghavan et al. 2007), made deterministic: every node re-labels to the
    most frequent label among its neighbors AND itself (the self-vote damps
    the 2-cycle oscillation of the pure synchronous rule), ties broken to
    the SMALLEST label. Returns early when a round changes nothing;
    otherwise returns the state after ``max_iterations``. Unlike
    connected_components this does NOT raise at the cap — LPA is a
    heuristic with no convergence guarantee, and the fixed-round state is
    a valid (and, being deterministic, reproducible) answer.

    Scale shape per round: one join (edges x labels) + one (node, label)
    count + one max_by per node — the same two-exchange profile as a
    pagerank round. Labels are node ids, so communities are identified by
    their smallest member in practice (exactly = only after convergence).
    """
    e = canonical_edges(edges, src, dst)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
    )
    # self-edge per node = the self-vote; union once, pin once
    und = (
        e.select("u", "v")
        .unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .unionAll(nodes.select(F.col("node").alias("u"), F.col("node").alias("v")))
        .transform(pin, eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(max_iterations):
        votes = (
            und.join(
                labels.select(F.col("node").alias("v"), F.col("label").alias("lab")),
                "v",
            )
            .groupBy("u", "lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        new_labels = (
            votes.groupBy("u")
            .agg(
                F.max_by(
                    F.col("lab"), F.struct(F.col("cnt"), (-F.col("lab")).alias("nl"))
                ).alias("label")
            )
            .select(F.col("u").alias("node"), "label")
            .transform(pin, eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def graph_quality_signals(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Per-document structural quality signals from the near-dup pair
    graph, joined back onto the corpus: ``degree`` (how many near-dups),
    ``coefficient`` (how clique-like the neighborhood — template farms and
    boilerplate rings sit near 1.0), ``core`` (depth inside the duplicate
    mass), ``component`` (the dedup cluster id). Documents outside the
    pair graph get degree 0 / coefficient 0.0 / core 0 / component = own
    id — every document gets a full signal row, ready for the attribute
    store (operators/attributes.py) or a quality-policy join.

    One composition, no new machinery: clustering_coefficient +
    core_numbers + connected_components over the same canonical edge
    list, three uniform-key joins back to the corpus."""
    sig = (
        clustering_coefficient(pairs, src, dst)
        .join(core_numbers(pairs, src, dst), "node")
        .join(connected_components(pairs, src, dst), "node")
        .withColumnRenamed("node", id_col)
    )
    return (
        docs.select(id_col)
        .join(sig, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("degree"), F.lit(0)).alias("degree"),
            F.coalesce(F.col("coefficient"), F.lit(0.0)).alias("coefficient"),
            F.coalesce(F.col("core"), F.lit(0)).alias("core"),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
            (F.col("degree").isNotNull()).alias("in_dup_graph"),
        )
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    normalize_every: int = 3,
) -> DataFrame:
    """(node, hub, authority) by HITS power iteration (Kleinberg 1999):
    authority = normalized in-flow of hub scores, hub = normalized
    out-flow of authority scores, L1-normalized (sum = 1, which keeps the
    fixpoint deterministic without an eigenvector sign convention).
    Directed multigraph edges collapse to simple edges.

    Normalization is BATCHED (r14, VERDICT item 4): both updates are
    linear, so the L1 constants commute with them — a_t/||a_t|| is the
    same vector whether the divide happens every round or once at the
    end (the intermediate constants cancel:
    A·(a/t) / ||A·(a/t)|| == A·a / ||A·a||). The iteration therefore
    runs RAW for ``normalize_every`` rounds between 1-row rescale
    collects (plus one final normalize), cutting the driver round-trips
    from two per round to two per batch while returning the identical
    per-round-normalized sequence up to float rounding (~1e-16
    relative; the numpy-parity test pins 1e-9). ``normalize_every``
    also bounds the unnormalized growth to lambda_max^normalize_every
    between rescales — keep it small (3) so doubles never approach
    overflow on any plausible graph.

    Scale shape per round: two shuffled joins (hub mass keyed on src,
    authority mass keyed on dst), both map-side combined; ranks pinned
    per round like pagerank; one 2-column normalization aggregate per
    batch."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .transform(pin, eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(pin, eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
    if normalize_every < 1:
        raise ValueError("normalize_every must be >= 1")
    scores = nodes.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("authority")
    )
    for i in range(iterations):
        auth_in = (
            e.join(
                scores.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
            .select(F.col("dst").alias("node"), "a_raw")
        )
        new_auth = nodes.join(auth_in, "node", "left").select(
            "node",
            F.coalesce(F.col("a_raw"), F.lit(0.0)).alias("authority"),
        )
        hub_out = (
            e.join(
                new_auth.select(F.col("node").alias("dst"), "authority"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("authority").alias("h_raw"))
            .select(F.col("src").alias("node"), "h_raw")
        )
        scores = (
            nodes.join(hub_out, "node", "left")
            .join(new_auth, "node")
            .select(
                "node",
                F.coalesce(F.col("h_raw"), F.lit(0.0)).alias("hub"),
                "authority",
            )
            .transform(pin, eager=True)
        )
        if (i + 1) % normalize_every == 0 or i == iterations - 1:
            tot = scores.agg(
                F.sum("hub").alias("h"), F.sum("authority").alias("a")
            ).collect()[0]
            h_tot, a_tot = float(tot["h"] or 1.0), float(tot["a"] or 1.0)
            # lazy rescale — folds into the next batch's plan (or the
            # returned frame); no extra job beyond the 1-row collect
            scores = scores.select(
                "node",
                (F.col("hub") / F.lit(h_tot)).alias("hub"),
                (F.col("authority") / F.lit(a_tot)).alias("authority"),
            )
    return scores


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> float:
    """Newman modularity Q of a community assignment over the undirected
    simple graph — the standard objective for judging a partition (LPA,
    components, any clustering): Q = sum_c [ e_c/m - (d_c/(2m))^2 ] with
    e_c = intra-community edges, d_c = total degree inside c, m = edges.
    One labels join per endpoint + two bounded aggregations; returns a
    driver float (it IS a scalar diagnostic)."""
    e = canonical_edges(edges, src, dst).transform(pin, eager=True)
    m = e.count()
    if m == 0:
        return 0.0
    lab = labels.select(F.col("node"), F.col("label"))
    both = (
        e.join(lab.select(F.col("node").alias("u"), F.col("label").alias("lu")), "u")
        .join(lab.select(F.col("node").alias("v"), F.col("label").alias("lv")), "v")
    )
    intra = (
        both.filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    deg_c = (
        degrees(e, "u", "v")
        .join(lab, "node")
        .groupBy("label")
        .agg(F.sum("degree").alias("d_c"))
    )
    # per-community terms stay distributed; only the final Q crosses to
    # the driver (communities can number in the millions at corpus scale)
    q = (
        deg_c.join(intra, "label", "left")
        .select(
            (
                F.coalesce(F.col("e_c"), F.lit(0)) / F.lit(float(m))
                - (F.col("d_c") / F.lit(2.0 * m)) ** 2
            ).alias("term")
        )
        .agg(F.sum("term"))
        .collect()[0][0]
    )
    return float(q)


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    walk_length: int = 5,
    seed: int = 42,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """(walk_id, step, node) — DeepWalk-style uniform random walks, the
    training-corpus generator for graph embeddings (Perozzi 2014), made
    fully DETERMINISTIC: step choices come from
    crc32(walk_id:step:seed) % degree over the node's sorted neighbor
    list, so any engine (and the Python reference test) reproduces the
    same walks bit-for-bit — re-running a 100 TB job after a failure
    regenerates identical training data, no RNG state to persist.

    ``walks_per_node`` walks start at every node; a walk stops early at a
    node with no (out-)neighbors. Scale shape: one row_number window over
    the adjacency (build-once, pinned), then per step ONE join keyed on
    the current node + ONE indexed-neighbor join — the frontier stays at
    nodes x walks_per_node rows for every step, and walk state never
    accumulates in the frontier (steps are appended to the result set,
    pinned per round like every iterative operator here).

    Known skew exposure, deliberate: the BUILD-ONCE dense neighbor index
    sorts each node's adjacency in that node's window task, so a
    100M-degree hub pays one degree-sized sort — once, amortized over
    all steps, unlike the per-round sort the r10 coreness finding
    removed. A dense 1..deg index has no aggregation-based equivalent
    (top-k tricks don't yield dense ranks); the skew-proof alternative —
    per-step argmin-of-hash neighbor choice via map-side-combinable
    min_by — trades it for an O(occupied-adjacency) aggregation EVERY
    step, which loses whenever walk_length > 1. Flip the trade only if
    profiles show the one-time hub sort dominating."""
    from pyspark.sql import Window

    if directed:
        adj_edges = edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).distinct()
    else:
        e = canonical_edges(edges, src, dst)
        adj_edges = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    w = Window.partitionBy("u").orderBy("v")
    adj = adj_edges.withColumn("rn", F.row_number().over(w)).transform(
        pin, eager=True
    )
    deg = adj.groupBy("u").agg(F.max("rn").alias("deg"))
    nodes = adj.select(F.col("u").alias("node")).distinct().unionByName(
        adj.select(F.col("v").alias("node")).distinct()
    ).distinct()
    starts = nodes.crossJoin(
        F.broadcast(
            nodes.sparkSession.range(walks_per_node).select(
                F.col("id").alias("k")
            )
        )
    ).select(
        F.concat_ws("_", F.col("node").cast("string"), F.col("k")).alias(
            "walk_id"
        ),
        F.lit(0).alias("step"),
        "node",
    )
    out = starts.transform(pin, eager=True)
    frontier = out
    for step in range(walk_length):
        pick_key = F.concat_ws(
            ":", F.col("walk_id"), F.lit(step), F.lit(seed)
        )
        nxt = (
            frontier.join(deg.withColumnRenamed("u", "node"), "node")
            .withColumn(
                "rn",
                (F.crc32(pick_key.cast("binary")) % F.col("deg") + 1).cast("int"),
            )
            .join(adj.withColumnRenamed("u", "node"), ["node", "rn"])
            .select(
                "walk_id",
                F.lit(step + 1).alias("step"),
                F.col("v").alias("node"),
            )
            .transform(pin, eager=True)
        )
        out = out.unionByName(nxt)
        frontier = nxt
    return out
