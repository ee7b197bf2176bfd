"""Multi-turn conversation (SFT/chat) data operators — the
supervised-finetuning leg of the training-data pipeline. Document
operators treat a row as one text; chat corpora are TURN tables
``(conv_id, turn_idx, role, content)`` and need their own contracts:
structural validation (role protocol), conversation-level dedup
identity, and rendering to a single training text under a token budget
with the assistant spans recorded for loss masking.

Operators:

* :func:`conversation_report` — per-conversation structural audit
  (turn counts, role protocol, empty/duplicate turns, one ``ok``
  verdict). The validator is a REPORT, not a filter — the never-silent
  rule the ingest family follows.
* :func:`conversation_fingerprints` — dedup identity over the
  normalized ordered transcript; feeds ``dedup.exact_dedup_groups`` /
  the streaming dedup gate exactly like a document fingerprint.
* :func:`render_conversations` — one training text per conversation:
  leading system turns pinned, then the longest SUFFIX of the remaining
  turns that fits ``max_tokens`` (drop-oldest truncation, the standard
  chat-window rule; the final turn survives even when it alone is over
  budget), rendered as ``role: content`` lines. Emits
  ``assistant_spans`` — [start, end) character offsets of every kept
  assistant turn's content in the rendered text — so a trainer can
  build the prompt-loss mask without re-parsing the string.

Scale: one shuffle per operator (the inherent groupBy conv_id); every
per-conversation rule — sorting turns, the role-protocol checks, the
drop-oldest budget walk, the render with span offsets — is JVM
higher-order-function algebra over the collected turn array (bounded by
conversation length, the same boundedness every text operator assumes
of a document). Zero Python anywhere.

Token/whitespace conventions shared with packing/chunking; the
fingerprint normalization matches ``dedup.normalize_text`` (trim +
whitespace collapse + lowercase is NOT applied — role/content identity
is case-significant, only whitespace is normalized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r"[ \t\r\n\f]+"


def _sorted_turns(
    turns: DataFrame,
    conv_col: str,
    idx_col: str,
    role_col: str,
    content_col: str,
) -> DataFrame:
    """(conv_id, turns: array<struct<idx, role, content>> sorted by idx) —
    array_sort on the struct sorts by the first field, so idx leads.

    NULL role/content coalesce to '' HERE, at the one entry point all
    three operators share: a NULL would otherwise propagate through the
    concat folds (NULLing the fingerprint element — which array_join then
    silently DROPS, colliding distinct transcripts — the whole rendered
    text, and the report's no_empty verdict, which evaluates to NULL
    rather than false under forall). With the coalesce a NULL turn flags
    ``no_empty = false``, keeps its own fingerprint position, and renders
    as ``role: `` — never silent."""
    return turns.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(idx_col).cast("long").alias("idx"),
                    F.coalesce(
                        F.col(role_col).cast("string"), F.lit("")
                    ).alias("role"),
                    F.coalesce(
                        F.col(content_col).cast("string"), F.lit("")
                    ).alias("content"),
                )
            )
        ).alias("turns")
    )


def _line(t: Column) -> Column:
    """The rendered form of one turn: ``role: content``."""
    return F.concat(t["role"], F.lit(": "), t["content"])


def _tok(t: Column) -> Column:
    """Whitespace tokens of the rendered line (engine convention)."""
    return F.size(F.split(F.trim(_line(t)), _WS)).cast("long")


def conversation_report(
    turns: DataFrame,
    roles: tuple[str, str] = ("user", "assistant"),
    system_role: str = "system",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
) -> DataFrame:
    """Per-conversation structural audit: (conv_id, n_turns, n_system,
    n_assistant, starts_ok, alternates, no_empty, no_dup_idx, ok).

    The role protocol checked is the standard chat shape: any number of
    LEADING ``system_role`` turns, then strict ``roles[0]``/``roles[1]``
    alternation starting with ``roles[0]`` — a system turn appearing
    after the first non-system turn breaks ``alternates``. ``no_empty``
    requires non-blank content in every turn; ``no_dup_idx`` requires
    distinct turn indexes. ``ok`` is the conjunction — filter on it, or
    keep the report as the audit artifact."""
    base = _sorted_turns(turns, conv_col, idx_col, role_col, content_col)
    t = F.col("turns")
    n = F.size(t)
    is_sys = lambda x: x["role"] == system_role  # noqa: E731
    # leading system block length = index of first non-system turn
    # (array_position returns 0 — not NULL — when nothing matches, so an
    # all-system conversation maps to lead_sys = n, not -1)
    first_non_sys = F.array_position(
        F.transform(t, lambda x: ~is_sys(x)), F.lit(True)
    ).cast("int")
    lead_sys = F.when(first_non_sys == 0, n).otherwise(first_non_sys - 1)
    rest = F.slice(t, lead_sys + 1, n)  # may be empty
    alternates = F.when(F.size(rest) == 0, F.lit(False)).otherwise(
        F.aggregate(
            F.zip_with(
                rest,
                F.sequence(F.lit(0), F.greatest(F.size(rest) - 1, F.lit(0))),
                lambda x, i: x["role"]
                == F.when(i % 2 == 0, F.lit(roles[0])).otherwise(
                    F.lit(roles[1])
                ),
            ),
            F.lit(True),
            lambda acc, v: acc & v,
        )
    )
    return base.select(
        "conv_id",
        n.alias("n_turns"),
        F.size(F.filter(t, is_sys)).alias("n_system"),
        F.size(F.filter(t, lambda x: x["role"] == roles[1])).alias(
            "n_assistant"
        ),
        (F.size(rest) > 0).alias("starts_ok"),
        alternates.alias("alternates"),
        F.forall(t, lambda x: F.trim(x["content"]) != "").alias("no_empty"),
        (F.size(F.array_distinct(F.transform(t, lambda x: x["idx"]))) == n).alias(
            "no_dup_idx"
        ),
    ).withColumn(
        "ok",
        F.col("starts_ok")
        & F.col("alternates")
        & F.col("no_empty")
        & F.col("no_dup_idx"),
    )


def conversation_fingerprints(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
) -> DataFrame:
    """(conv_id, fingerprint): md5 over the ordered transcript with each
    turn as ``role\\x1f content-whitespace-normalized`` joined by
    ``\\x1e`` (unit/record separators — characters no chat content
    contains, so turn boundaries can't be forged by crafted content).
    Same-dialogue refetches with different turn_idx numbering or
    whitespace collapse to one fingerprint; feeds
    ``dedup.exact_dedup_groups`` and the streaming dedup gate as-is."""
    base = _sorted_turns(turns, conv_col, idx_col, role_col, content_col)
    norm = F.transform(
        F.col("turns"),
        lambda t: F.concat(
            t["role"],
            F.lit("\x1f"),
            F.regexp_replace(F.trim(t["content"]), _WS, " "),
        ),
    )
    return base.select(
        "conv_id", F.md5(F.array_join(norm, "\x1e")).alias("fingerprint")
    )


def render_conversations(
    turns: DataFrame,
    max_tokens: int = 2048,
    system_role: str = "system",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
    assistant_role: str = "assistant",
) -> DataFrame:
    """One row per conversation: (conv_id, text, n_turns_kept,
    n_turns_dropped, n_tokens, assistant_spans).

    Rendering: kept turns as ``role: content`` lines joined by ``\\n``.
    Budgeting: leading system turns are PINNED (instructions survive
    truncation), then the longest suffix of the remaining turns whose
    line tokens + system tokens fit ``max_tokens`` — oldest turns drop
    first, and the FINAL turn is always kept even if it alone exceeds
    the budget (a conversation never renders empty).
    ``assistant_spans`` are [start, end) char offsets of each kept
    ``assistant_role`` turn's CONTENT in ``text`` (label side of the
    loss mask); slicing ``text`` by a span returns exactly that turn's
    content — pinned in tests."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    base = _sorted_turns(turns, conv_col, idx_col, role_col, content_col)
    t = F.col("turns")
    n = F.size(t)
    first_non_sys = F.array_position(
        F.transform(t, lambda x: x["role"] != system_role), F.lit(True)
    ).cast("int")
    lead_sys = F.when(first_non_sys == 0, n).otherwise(first_non_sys - 1)
    sys_block = F.slice(t, 1, lead_sys)
    rest = F.slice(t, lead_sys + 1, n)
    sys_toks = F.aggregate(
        F.transform(sys_block, _tok), F.lit(0).cast("long"), lambda a, v: a + v
    )
    budget = F.greatest(F.lit(max_tokens).cast("long") - sys_toks, F.lit(0).cast("long"))
    # drop-oldest: walk the non-system turns from the END, keep while the
    # budget holds (the final turn unconditionally); fold carries
    # (kept count, token acc, still-open flag)
    kept_state = F.aggregate(
        F.reverse(F.transform(rest, _tok)),
        F.struct(
            F.lit(0).alias("kept"),
            F.lit(0).cast("long").alias("acc"),
            F.lit(True).alias("open"),
        ),
        lambda s, tk: F.struct(
            F.when(
                s["open"] & ((s["acc"] + tk <= budget) | (s["kept"] == 0)),
                s["kept"] + 1,
            )
            .otherwise(s["kept"])
            .alias("kept"),
            F.when(
                s["open"] & ((s["acc"] + tk <= budget) | (s["kept"] == 0)),
                s["acc"] + tk,
            )
            .otherwise(s["acc"])
            .alias("acc"),
            (
                s["open"] & ((s["acc"] + tk <= budget) | (s["kept"] == 0))
            ).alias("open"),
        ),
    )
    n_kept_rest = F.when(F.size(rest) > 0, kept_state["kept"]).otherwise(
        F.lit(0)
    )
    kept = F.concat(
        sys_block, F.slice(rest, F.size(rest) - n_kept_rest + 1, n_kept_rest)
    )
    # render + spans in ONE fold carrying (text, char pos, spans)
    rendered = F.aggregate(
        kept,
        F.struct(
            F.lit("").alias("text"),
            F.lit(0).cast("long").alias("pos"),
            F.array().cast("array<struct<s:long,e:long>>").alias("spans"),
        ),
        lambda s, x: F.struct(
            F.concat(
                s["text"],
                F.when(s["pos"] == 0, F.lit("")).otherwise(F.lit("\n")),
                _line(x),
            ).alias("text"),
            (
                s["pos"]
                + F.when(s["pos"] == 0, F.lit(0)).otherwise(F.lit(1))
                + F.length(_line(x))
            ).cast("long").alias("pos"),
            F.when(
                x["role"] == assistant_role,
                F.concat(
                    s["spans"],
                    F.array(
                        F.struct(
                            (
                                s["pos"]
                                + F.when(s["pos"] == 0, F.lit(0)).otherwise(
                                    F.lit(1)
                                )
                                + F.length(x["role"])
                                + 2
                            ).cast("long").alias("s"),
                            (
                                s["pos"]
                                + F.when(s["pos"] == 0, F.lit(0)).otherwise(
                                    F.lit(1)
                                )
                                + F.length(_line(x))
                            ).cast("long").alias("e"),
                        )
                    ),
                ),
            )
            .otherwise(s["spans"])
            .alias("spans"),
        ),
    )
    return base.select(
        "conv_id",
        F.size(kept).alias("n_turns_kept"),
        (n - F.size(kept)).alias("n_turns_dropped"),
        rendered.alias("_r"),
        F.aggregate(
            F.transform(kept, _tok), F.lit(0).cast("long"), lambda a, v: a + v
        ).alias("n_tokens"),
    ).select(
        "conv_id",
        F.col("_r.text").alias("text"),
        "n_turns_kept",
        "n_turns_dropped",
        "n_tokens",
        F.col("_r.spans").alias("assistant_spans"),
    )
