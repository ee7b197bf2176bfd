"""Distribution drift between two corpus snapshots — the statistical
complement of ``report.corpus_diff`` (which answers WHICH ids changed;
this answers whether the corpus' SHAPE moved): two-sample
Kolmogorov-Smirnov for numeric columns, chi-square + total-variation
distance for categoricals, one report row per watched column. The
check a training pipeline runs between snapshot N and N+1 before
retraining — a feed that silently shifted its length/score/language
distribution becomes a number with a threshold, not a surprise.

Scale shape: every statistic reduces each side to per-value (or
per-bin) COUNTS first — the exchanges carry (key, n_old, n_new), never
rows. The KS cumulative walk is a single-partition window over the
DISTINCT values, so ``ks_drift`` with ``bins=None`` (exact) is for
columns whose distinct-value count is bounded (grades, quantized
scores, small-int features); for continuous columns pass ``bins=k`` —
values are binned on a fixed-width grid from the two sides' pooled
min/max (one 1-row broadcast), the ECDF walk shrinks to k rows, and the
statistic is the standard binned-KS lower bound of the exact D.

Determinism contract (the evals/registry pattern): counts are exact
longs; each ECDF/expected-frequency term is one double division of
exact ints (operand-identical in any engine); order-dependent SUMS
(chi-square, TVD) accumulate 9dp-rounded terms as exact DECIMAL.

Empty-side contract: when a side has ZERO non-null rows the statistic
is undefined — every division hits a zero total and Spark's non-ANSI
division yields NULL, so the report row carries ``statistic = NULL``
(never a silent 0.0 or NaN). ``drifted_epochs`` treats a NULL
statistic as an ALERTING row: a drained snapshot is a drift event,
not a quiet pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(28,9)"

#: zero-share smoothing floor for PSI (the industry convention: a bin
#: empty on one side contributes a large-but-finite term instead of inf)
PSI_EPS = 1e-6

#: exact-mode (bins=None) safety cap: the KS cumulative walk is a
#: single-partition window over the DISTINCT values, so exact mode is
#: for bounded-distinct columns only — the guard makes that documented
#: contract self-enforcing instead of advisory (one sorted task over
#: >10k rows is where the single-partition window starts to matter)
EXACT_DISTINCT_CAP = 10_000


def _psi_term(p_old: F.Column, p_new: F.Column) -> F.Column:
    """One PSI summand (p_new - p_old) * ln(p_new / p_old), shares
    floored at PSI_EPS; 9dp-rounded and DECIMAL-typed for an order-free
    sum (ln is libm — the rounding bounds engine skew to the term's
    last decimal). A NULL share (empty side — try_divide's zero-total
    signal) yields a NULL term, NOT an eps-floored one: greatest()
    skips NULLs, so without the guard an undefined share would silently
    read as the floor and produce a fabricated PSI."""
    po = F.greatest(p_old, F.lit(PSI_EPS))
    pn = F.greatest(p_new, F.lit(PSI_EPS))
    term = F.round((pn - po) * F.log(pn / po), 9).cast(_DEC)
    return F.when(
        p_old.isNull() | p_new.isNull(), F.lit(None).cast(_DEC)
    ).otherwise(term)


def _sided_counts(
    old: DataFrame, new: DataFrame, key: F.Column, col: str
) -> DataFrame:
    """(key, n_old, n_new) — each side aggregated before the union, so
    the exchange carries counts; NULLs are excluded (report them via
    profile/checks, a drift test on missingness is a count ratio)."""
    o = (
        old.select(key.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    n = (
        new.select(key.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    from ..checkpoint import pin

    # pin the counts frame (distinct values/bins/categories — small by
    # construction): it feeds BOTH the totals aggregate and the
    # statistic walk, and without the pin each consumer re-ran the two
    # corpus scans (verified: 4 scans static -> 2 with the pin)
    return (
        o.join(n, "k", "full_outer")
        .select(
            "k",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .transform(pin, eager=False)
    )


def ks_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    bins: int | None = None,
    max_exact_distinct: int | None = EXACT_DISTINCT_CAP,
) -> DataFrame:
    """One row: (column, kind, statistic, psi, n_old, n_new) with
    ``statistic`` the
    two-sample KS D = max_x |F_old(x) - F_new(x)| over the column's
    observed values (``bins=None``, exact — bounded-distinct columns
    only, see module docstring) or over a ``bins``-cell fixed-width grid
    between the pooled min/max (continuous columns; grid edges from ONE
    1-row broadcast). NULLs excluded on both sides, in BOTH modes — a
    NULL never lands in a bin (the bin expression would otherwise fold
    NULL into the top bin via ``least``'s null-skipping).

    Exact mode enforces its bounded-distinct contract: if the two sides'
    pooled distinct-value count exceeds ``max_exact_distinct`` the call
    raises (loudly, naming the fix) instead of quietly sorting the
    distinct values through one task. Pass ``max_exact_distinct=None``
    to disable the guard, or ``bins=k`` for continuous columns. The
    guard's count() doubles as the eager materialization of the pinned
    counts frame, so it costs no extra corpus scan."""
    c = F.col(col).cast("double")
    if bins is None:
        key = c
        counts = _sided_counts(old, new, key, col)
        if max_exact_distinct is not None:
            n_distinct = counts.count()
            if n_distinct > max_exact_distinct:
                raise ValueError(
                    f"ks_drift exact mode (bins=None) on {col!r}: "
                    f"{n_distinct} distinct values exceeds the "
                    f"bounded-distinct cap {max_exact_distinct}; pass "
                    f"bins=k for continuous columns or raise "
                    f"max_exact_distinct explicitly"
                )
    else:
        if bins < 2:
            raise ValueError(f"bins must be >= 2, got {bins}")
        from ..checkpoint import pin

        # pin the 1-row min/max: it broadcasts into BOTH sides' bin
        # expressions, and without the pin each crossJoin consumer would
        # re-run the pooled scan — two extra corpus passes at scale
        pooled = (
            old.select(c.alias("v"))
            .unionByName(new.select(c.alias("v")))
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
            .transform(pin, eager=True)
        )
        # NULLs out BEFORE binning: least(NULL, bins-1) SKIPS the null
        # and would file every NULL under the top bin (and the hi==lo
        # branch under bin 0), breaking the NULLs-excluded contract and
        # making binned and exact modes disagree on NULL-bearing columns
        o = (
            old.select(c.alias("_v"))
            .filter(F.col("_v").isNotNull())
            .crossJoin(F.broadcast(pooled))
        )
        n = (
            new.select(c.alias("_v"))
            .filter(F.col("_v").isNotNull())
            .crossJoin(F.broadcast(pooled))
        )
        # UNBOUND bin expression (plain column names) so the same
        # definition resolves against either side's frame
        width = (F.col("hi") - F.col("lo")) / bins
        raw = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.floor((F.col("_v") - F.col("lo")) / width)
        )
        bin_key = F.least(raw.cast("int"), F.lit(bins - 1))
        counts = _sided_counts(o, n, bin_key, col)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    tot = counts.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    # try_divide: a zero side total (empty/all-NULL snapshot) makes the
    # ECDF undefined — NULL by contract, never an ANSI divide error
    ecdf = counts.crossJoin(F.broadcast(tot)).select(
        "k",
        F.try_divide(
            F.sum("n_old").over(w).cast("double"), F.col("t_old")
        ).alias("f_old"),
        F.try_divide(
            F.sum("n_new").over(w).cast("double"), F.col("t_new")
        ).alias("f_new"),
        _psi_term(
            F.try_divide(F.col("n_old").cast("double"), F.col("t_old")),
            F.try_divide(F.col("n_new").cast("double"), F.col("t_new")),
        ).alias("_psi"),
        "t_old",
        "t_new",
    )
    return ecdf.agg(
        F.max(F.abs(F.col("f_old") - F.col("f_new"))).alias("statistic"),
        F.sum("_psi").cast("double").alias("psi"),
        F.first("t_old").alias("n_old"),
        F.first("t_new").alias("n_new"),
    ).select(
        F.lit(col).alias("column"),
        F.lit("ks").alias("kind"),
        "statistic",
        "psi",
        "n_old",
        "n_new",
    )


def categorical_drift(
    old: DataFrame, new: DataFrame, col: str
) -> DataFrame:
    """One row: (column, kind='chi2', statistic, tvd, psi, top_mover,
    n_old, n_new). ``statistic`` is the two-sample chi-square over the category
    contingency (expected frequencies from pooled marginals; categories
    seen on one side only contribute fully), ``tvd`` the total-variation
    distance 0.5*sum|p_old - p_new|, ``psi`` the population stability
    index over category shares (PSI_EPS floor), and ``top_mover`` the category with
    the largest absolute share shift (ties to the smallest category
    value — deterministic). Chi-square/TVD terms are 9dp-rounded and
    DECIMAL-summed (order-free)."""
    counts = _sided_counts(old, new, F.col(col).cast("string"), col)
    tot = counts.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    c = counts.crossJoin(F.broadcast(tot))
    # expected count of category k on side s = row_total * side_total / N
    row_tot = F.col("n_old") + F.col("n_new")
    grand = F.col("t_old") + F.col("t_new")
    e_old = row_tot.cast("double") * F.col("t_old") / grand
    e_new = row_tot.cast("double") * F.col("t_new") / grand
    # try_divide: e_old/e_new are zero exactly when that side's TOTAL is
    # zero (empty snapshot) — the chi term is then undefined -> NULL,
    # and the NULL-skipping sum leaves statistic NULL (empty-side
    # contract), never an ANSI divide error
    chi_term = F.round(
        F.try_divide(
            (F.col("n_old") - e_old) * (F.col("n_old") - e_old), e_old
        )
        + F.try_divide(
            (F.col("n_new") - e_new) * (F.col("n_new") - e_new), e_new
        ),
        9,
    )
    p_old = F.try_divide(F.col("n_old").cast("double"), F.col("t_old"))
    p_new = F.try_divide(F.col("n_new").cast("double"), F.col("t_new"))
    shift = F.abs(p_old - p_new)
    per = c.select(
        "k",
        chi_term.cast(_DEC).alias("_chi"),
        F.round(shift, 9).cast(_DEC).alias("_shift"),
        _psi_term(p_old, p_new).alias("_psi"),
        "t_old",
        "t_new",
    )
    return per.agg(
        F.sum("_chi").cast("double").alias("statistic"),
        # halve AFTER the exact-decimal sum converts to double: /2 is an
        # exponent shift (exact), whereas decimal division would re-round
        # at the decimal scale — double(sum)/2 is the engine-portable form
        (F.sum("_shift").cast("double") / 2).alias("tvd"),
        F.sum("_psi").cast("double").alias("psi"),
        F.min_by(
            "k", F.struct((-F.col("_shift")).alias("s"), F.col("k").alias("k"))
        ).alias("top_mover"),
        F.first("t_old").alias("n_old"),
        F.first("t_new").alias("n_new"),
    ).select(
        F.lit(col).alias("column"),
        F.lit("chi2").alias("kind"),
        "statistic",
        "tvd",
        "psi",
        "top_mover",
        "n_old",
        "n_new",
    )


def drift_report(
    old: DataFrame,
    new: DataFrame,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    bins: int | None = 64,
    quantile_cols: list[str] | None = None,
    quantile_bins: int = 10,
) -> DataFrame:
    """One row per watched column: numeric columns via :func:`ks_drift`
    (binned by default — pass ``bins=None`` only for bounded-distinct
    columns), categoricals via :func:`categorical_drift`,
    ``quantile_cols`` via :func:`quantile_drift` (equal-mass
    reference-quantile bins — the right mode for long-tailed numerics
    where a fixed-width grid goes blind); harmonized schema (column,
    kind, statistic, tvd, psi, top_mover, n_old, n_new) with
    the non-applicable fields NULL. Thresholding is the caller's policy
    — this is the measurement, kept a report like checks/profile."""
    parts: list[DataFrame] = []
    for c in numeric_cols or []:
        parts.append(
            ks_drift(old, new, c, bins=bins).select(
                "column",
                "kind",
                "statistic",
                F.lit(None).cast("double").alias("tvd"),
                "psi",
                F.lit(None).cast("string").alias("top_mover"),
                "n_old",
                "n_new",
            )
        )
    for c in categorical_cols or []:
        parts.append(categorical_drift(old, new, c))
    for c in quantile_cols or []:
        parts.append(quantile_drift(old, new, c, q=quantile_bins))
    if not parts:
        raise ValueError("no columns to watch: pass numeric or categorical columns")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-distribution drift: the share of each snapshot falling
    into each centroid's cell, compared through
    :func:`categorical_drift` — one row (column=``vec_col``,
    kind='chi2', statistic, tvd, psi, top_mover, n_old, n_new) where
    ``top_mover`` is the centroid (as a string cluster id) whose share
    shifted most. The embedding monitor a retraining pipeline runs
    between snapshot N and N+1: a feed whose vectors silently rotated
    toward a different region of the space becomes a thresholdable
    number, without any all-pairs work.

    ``centroids`` is (cluster, centroid) — ``semdedup.train_centroids``
    output or any model table — and MUST be the same frame for both
    sides: the cells are the measurement grid, so train them once on
    the reference snapshot and reuse (re-training per snapshot would
    move the grid under the comparison and hide drift).

    Scale shape: nearest-centroid assignment is a broadcast map-side
    argmax on each side (zero shuffle — semdedup.assign_clusters), and
    everything after is categorical_drift's (cluster, n_old, n_new)
    count reduction; nothing vector-sized ever crosses an exchange."""
    from .semdedup import assign_clusters

    o = assign_clusters(
        old, centroids, vec_col=vec_col, id_col=id_col, dim=dim
    ).select("cluster")
    n = assign_clusters(
        new, centroids, vec_col=vec_col, id_col=id_col, dim=dim
    ).select("cluster")
    return categorical_drift(o, n, "cluster").withColumn(
        "column", F.lit(vec_col)
    )


def quantile_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    q: int = 10,
    accuracy: int = 10_000,
) -> DataFrame:
    """Reference-quantile binned drift: the OLD snapshot's q-quantiles
    define the bin edges (equal-mass on the reference — the industry
    PSI convention of decile bins), both sides are counted per bin, and
    the categorical machinery runs over the bins — one row
    (column=``col``, kind='chi2', statistic, tvd, psi, top_mover
    (= the bin index as a string), n_old, n_new).

    Why next to :func:`ks_drift`'s fixed-width bins: on long-tailed
    columns a fixed-width grid puts almost all mass in one cell and the
    statistic goes blind; equal-mass reference bins give every cell
    ~n/q reference weight, so a shift anywhere in the distribution moves
    a share some bin can see. The edges come from
    ``percentile_approx`` (a mergeable quantile sketch — the only
    scale-correct way to get quantiles; ``accuracy`` is its 1/eps
    knob), computed ONCE on the reference and pinned: the grid is part
    of the measurement, so it must come from the reference side only and
    never move under the comparison.

    Determinism note: the sketch's edges are data-dependent but the
    SAME pinned 1-row broadcast feeds both sides' bin expressions, so
    the comparison itself is exact-count arithmetic like every other
    statistic here. NULLs excluded on both sides; an empty side yields
    statistic NULL (the module's empty-side contract); an empty
    REFERENCE yields NULL edges -> every row filters out -> NULL too."""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    from ..checkpoint import pin

    c = F.col(col).cast("double")
    probs = [i / q for i in range(1, q)]
    edges = (
        old.select(c.alias("v"))
        .filter(F.col("v").isNotNull())
        .agg(F.percentile_approx("v", probs, accuracy).alias("edges"))
        .transform(pin, eager=True)
    )

    def binned(df: DataFrame) -> DataFrame:
        # bin k = number of interior edges strictly below the value:
        # 0..q-1, upper-inclusive like every quantile-bin convention
        return (
            df.select(c.alias("_v"))
            .filter(F.col("_v").isNotNull())
            .crossJoin(F.broadcast(edges))
            .select(
                F.size(
                    F.filter(F.col("edges"), lambda e: F.col("_v") > e)
                )
                .cast("string")
                .alias("qbin")
            )
        )

    return categorical_drift(binned(old), binned(new), "qbin").withColumn(
        "column", F.lit(col)
    )
