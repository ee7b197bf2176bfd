"""Preference-pair construction for reward-model / DPO training: turn a
graded-responses table ``(prompt_id, response_id, score)`` into
``(prompt_id, chosen_id, rejected_id, score_gap)`` training pairs — the
assembly step between human/model grading and preference-tuning, sibling
to the SFT operators in conversations.py.

A pair is only emitted for a STRICT preference (``score_gap > 0``): two
equally-scored responses carry no ordering signal, so ties never pair —
regardless of ``min_gap``. Determinism: every selection tie-breaks on
the smallest response id, and the all-pairs cap is a hash rank (pure
function of ids + salt), so re-runs and other engines reproduce the
exact pair set.

Scale: one shuffle on ``prompt_id`` each (the inherent key); the
all-pairs join is per-prompt bounded (responses per prompt is a grading
fan-out, not a corpus dimension) and the optional ``max_pairs_per_prompt``
cap is the engine's two-phase top-k, so no prompt's pair set ever sorts
in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_worst_pairs(
    responses: DataFrame,
    min_gap: float = 0.0,
    prompt_col: str = "prompt_id",
    id_col: str = "response_id",
    score_col: str = "score",
) -> DataFrame:
    """One pair per prompt: the top-scored response versus the
    bottom-scored one (the classic RM pair rule) — (prompt_id,
    chosen_id, rejected_id, chosen_score, rejected_score, score_gap).
    Ties break to the smallest response id on BOTH ends; prompts with a
    single response, or whose best and worst scores are equal, emit
    nothing (no strict preference). ``min_gap`` additionally drops
    weak-preference pairs."""
    base = responses.select(
        F.col(prompt_col).alias("prompt_id"),
        F.col(id_col).alias("response_id"),
        F.col(score_col).cast("double").alias("score"),
    ).filter(F.col("score").isNotNull())
    w_best = Window.partitionBy("prompt_id").orderBy(
        F.desc("score"), F.asc("response_id")
    )
    w_worst = Window.partitionBy("prompt_id").orderBy(
        F.asc("score"), F.asc("response_id")
    )
    ranked = base.select(
        "prompt_id",
        "response_id",
        "score",
        F.row_number().over(w_best).alias("_rb"),
        F.row_number().over(w_worst).alias("_rw"),
    )
    best = ranked.filter(F.col("_rb") == 1).select(
        "prompt_id",
        F.col("response_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    worst = ranked.filter(F.col("_rw") == 1).select(
        "prompt_id",
        F.col("response_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    return (
        best.join(worst, "prompt_id")
        .withColumn(
            "score_gap", F.col("chosen_score") - F.col("rejected_score")
        )
        .filter(
            (F.col("score_gap") > 0) & (F.col("score_gap") >= min_gap)
        )
    )


def graded_pairs(
    responses: DataFrame,
    min_gap: float = 0.0,
    max_pairs_per_prompt: int | None = None,
    salt: str = "prefpair-v1",
    prompt_col: str = "prompt_id",
    id_col: str = "response_id",
    score_col: str = "score",
) -> DataFrame:
    """Every strict-preference pair within each prompt: (prompt_id,
    chosen_id, rejected_id, chosen_score, rejected_score, score_gap)
    with ``score_gap > 0`` and ``>= min_gap`` — the dense pair set DPO
    variants train on when multiple gradations exist per prompt.

    ``max_pairs_per_prompt`` caps each prompt's pair count by
    deterministic md5 hash rank over (salt, prompt, chosen, rejected) —
    a uniform thinning that is a pure function of ids, reproducible
    across runs and engines (the posting-cap pattern: bounded output,
    nothing silently position-biased)."""
    base = responses.select(
        F.col(prompt_col).alias("prompt_id"),
        F.col(id_col).alias("response_id"),
        F.col(score_col).cast("double").alias("score"),
    ).filter(F.col("score").isNotNull())
    a = base.select(
        "prompt_id",
        F.col("response_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    b = base.select(
        "prompt_id",
        F.col("response_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    pairs = (
        a.join(b, "prompt_id")
        .withColumn(
            "score_gap", F.col("chosen_score") - F.col("rejected_score")
        )
        .filter((F.col("score_gap") > 0) & (F.col("score_gap") >= min_gap))
    )
    if max_pairs_per_prompt is None:
        return pairs
    if max_pairs_per_prompt < 1:
        raise ValueError(
            f"max_pairs_per_prompt must be >= 1, got {max_pairs_per_prompt}"
        )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col("prompt_id").cast("string"),
                    F.col("chosen_id").cast("string"),
                    F.col("rejected_id").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    wloc = Window.partitionBy("prompt_id", "_pid").orderBy(
        F.asc("_u"), F.asc("chosen_id"), F.asc("rejected_id")
    )
    w = Window.partitionBy("prompt_id").orderBy(
        F.asc("_u"), F.asc("chosen_id"), F.asc("rejected_id")
    )
    return (
        pairs.withColumn("_u", u)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wloc))
        .filter(F.col("_lr") <= max_pairs_per_prompt)
        .drop("_pid", "_lr")
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_pairs_per_prompt)
        .drop("_u", "_r")
    )
