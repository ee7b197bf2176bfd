"""Streaming sessionization — Spark's native ``session_window`` under a
watermark, the streaming twin of the registered batch query
(queries/misc.py ``session_window_agg``).

Semantics: a session is a maximal run of a user's events with no gap
longer than ``gap``; it closes — and is emitted exactly once, in append
mode — when the watermark passes its end + gap. Events arriving later
than ``watermark_delay`` behind the stream's max event time are dropped
by Spark's state manager (pinned by test), which is the bounded-disorder
contract the reference's reorder buffer provides (SURVEY W5/W6) expressed
as engine state rather than hand-rolled buffering.

Scale: state is one open session per (user, window) merged in place by
the session-window state store; per-batch shuffle is keyed by user, and
closed sessions leave state as the watermark advances, so state size is
bounded by the number of concurrently-open sessions, not by history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingSessionizer:
    """Sessionize an event stream; ``sessions`` is the streaming form,
    ``batch_sessions`` the identical aggregation in batch mode — the
    equivalence test closes one over the other on the same inputs."""

    def __init__(
        self,
        gap: str = "30 minutes",
        watermark_delay: str = "1 hour",
        user_col: str = "user_id",
        ts_col: str = "ts",
        value_col: str = "value",
    ) -> None:
        self.gap = gap
        self.watermark_delay = watermark_delay
        self.user_col = user_col
        self.ts_col = ts_col
        self.value_col = value_col

    def _aggregate(self, df: DataFrame) -> DataFrame:
        # same output contract as the registered batch query: exact
        # decimal sum cast to double AFTER aggregation, so streaming
        # merge order cannot perturb the float result
        return (
            df.groupBy(
                F.session_window(F.col(self.ts_col), self.gap),
                F.col(self.user_col),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col(self.value_col).cast("decimal(12,2)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                self.user_col,
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
                "sum_value",
            )
        )

    def sessions(self, stream: DataFrame) -> DataFrame:
        """Streaming form: watermarked, append-mode-ready (each closed
        session emitted exactly once)."""
        return self._aggregate(
            stream.withWatermark(self.ts_col, self.watermark_delay)
        )

    def batch_sessions(self, df: DataFrame) -> DataFrame:
        """The same aggregation over a static frame (no watermark)."""
        return self._aggregate(df)
