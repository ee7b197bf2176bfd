"""Unicode text normalization + encoding-health signals — the very first
pass of a web-corpus pipeline (before dedup fingerprints or quality
scores, which all change under NFC vs NFD spellings of the same text).

``normalize_unicode`` applies a Unicode normalization form (NFC default;
NFKC is the aggressive fold tokenizer pipelines often want). Spark has NO
native normalization expression, so this is one of the engine's few
sanctioned Arrow ``mapInPandas`` exceptions (same class as BPE apply and
the multimodal decoders: per-row semantics genuinely inexpressible in
``pyspark.sql.functions``); batches stream through ``unicodedata`` —
C-implemented, allocation-bound, no model state — and every other column
passes through untouched. DuckDB's ``nfc_normalize`` re-derives the NFC
form for the parity test, so the contract stays two-engine-checked.

``unicode_signals`` is all NATIVE expressions (regexp counts): the
encoding-health report — replacement characters (U+FFFD, the fingerprint
of a mojibake pipeline), control characters, zero-width/bidi characters
(the invisible-text and RTL-spoof signals), non-ASCII ratio, and whether
the text is already NFC-clean cannot be told natively, so that one rides
the normalize pass (changed = normalized != original).

Scale: the signals ride the corpus scan (zero shuffle); normalization is
a streaming Arrow map with no shuffle and no state — at 100 TB both are
pure scan passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")

#: replacement char / C0+C1 controls (minus \t\n\r) / zero-width+joiners /
#: bidi controls — the encoding-health classes worth counting separately
_REPLACEMENT = "�"
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"
_ZERO_WIDTH_RE = "[\\u200b\\u200c\\u200d\\u2060\\ufeff]"
_BIDI_RE = "[\\u202a-\\u202e\\u2066-\\u2069]"


def normalize_unicode(
    docs: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Return ``docs`` with ``text_col`` Unicode-normalized to ``form``
    (written to ``out_col`` if given, else in place). NULLs pass through.
    Column set, order, and every other value are preserved exactly."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    if text_col not in docs.columns:
        raise ValueError(f"no column {text_col!r} in {docs.columns}")
    target = out_col or text_col
    if out_col:
        docs = docs.withColumn(out_col, F.col(text_col))
    schema = docs.schema
    cols = docs.columns

    def _norm(batches):
        import unicodedata

        for pdf in batches:
            pdf[target] = pdf[target].map(
                lambda s: unicodedata.normalize(form, s)
                if isinstance(s, str)
                else s
            )
            yield pdf[cols]

    return docs.mapInPandas(_norm, schema)


def unicode_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_chars, n_non_ascii, non_ascii_ratio, n_replacement,
    n_control, n_zero_width, n_bidi) — the encoding-health report, pure
    native regexp counts riding the scan. NULL text yields NULL counts
    (absent text is a completeness problem, not an encoding one —
    ``checks.completeness`` owns it)."""
    t = F.col(text_col)
    n = F.length(t)
    n_non_ascii = F.regexp_count(t, F.lit("[^\\x00-\\x7F]"))
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        n_non_ascii.cast("long").alias("n_non_ascii"),
        # NULL text -> NULL ratio (the contract above); only an EMPTY
        # text is ratio 0.0 — a bare .otherwise(0.0) would make a feed
        # that went NULL read as perfectly-ASCII (r11 review find)
        F.when(n > 0, n_non_ascii.cast("double") / n)
        .when(n == 0, F.lit(0.0))
        .alias("non_ascii_ratio"),
        F.regexp_count(t, F.lit(_REPLACEMENT))
        .cast("long")
        .alias("n_replacement"),
        F.regexp_count(t, F.lit(_CONTROL_RE)).cast("long").alias("n_control"),
        F.regexp_count(t, F.lit(_ZERO_WIDTH_RE))
        .cast("long")
        .alias("n_zero_width"),
        F.regexp_count(t, F.lit(_BIDI_RE)).cast("long").alias("n_bidi"),
    )
