"""HTML-to-text extraction — the stage that precedes every published
crawl-cleaning battery (C4, CCNet, RefinedWeb all start from extracted
text): strip markup from raw HTML columns with engine-portable column
algebra so crawl snapshots can enter the corpus pipeline directly.

Deliberately a REGEX-GRADE extractor, not a DOM parser: at corpus scale
the published pipelines use exactly this class of extraction for the
bulk path (lxml/trafilatura-grade parsing is a per-document CPU cost
that dwarfs the scan), and a DOM library is not in this environment.
The rules are pinned, ordered, and each is a single codegen'd
``regexp_replace`` pass:

1. drop ``<script>``/``<style>``/``<noscript>`` blocks and HTML comments
   WITH their contents (case-insensitive, dot-matches-newline);
2. block-level closing tags and ``<br>`` become newlines (so line-based
   cleaners — C4's line filter — see real line structure);
3. every remaining tag is removed;
4. the common named entities (&amp; &lt; &gt; &quot; &#39; &nbsp;) and
   decimal ``&#NNN;`` escapes are decoded (decimal decode covers the
   ASCII range via a chr() lookup built as a chained conditional —
   column algebra, no UDF);
5. horizontal whitespace runs collapse to one space per line; blank-line
   runs collapse to one newline; edges are trimmed.

One text scan, zero shuffles, no Python in the path. Entity decoding
beyond the pinned set (named Unicode entities) is out of scope —
documented, and rare enough in crawl bodies that C4's gates absorb it.
No reference analog (the reference engine has no text layer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block-level elements whose close (or self-close) implies a line break
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote|pre|section"
    "|article|header|footer|title"
)

# the named entities worth decoding without a full table; &amp; LAST so
# double-escaped text decodes one level per pass like real decoders
_NAMED_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html_expr(col: Column) -> Column:
    """The extraction expression over one string column — compose freely
    (used by :func:`strip_html` and directly in select lists)."""
    x = F.regexp_replace(
        col, r"(?is)<(script|style|noscript)\b.*?</\1\s*>", " "
    )
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, rf"(?i)</({_BLOCK_TAGS})\s*>|<br\s*/?\s*>", "\n")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    # decimal entities decode BEFORE the named loop: the raw text
    # '&amp;#38;' contains no '&#' substring, so decimal-first leaves it
    # for the named pass to unescape exactly one level ('&#38;'); the
    # previous order double-decoded it to '&' (review find)
    x = _decode_decimal_entities(x)
    for ent, rep in _NAMED_ENTITIES:
        x = F.regexp_replace(x, ent, rep)
    x = F.regexp_replace(x, r"[ \t\r\f]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n{2,}", "\n")
    # trim() strips only spaces; match Python str.strip() on all edges
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def _decode_decimal_entities(col: Column) -> Column:
    """Replace ``&#NNN;`` for printable ASCII (32..126) with the
    character; all other numeric escapes become a space. Implemented as
    split-on-entity + per-fragment char() append — pure column algebra
    (regexp_extract_all + transform + concat), no UDF."""
    # fast path: nothing to decode
    has = col.rlike(r"&#[0-9]{1,7};")
    # split keeps fragments BETWEEN entities; extract the codes, then
    # interleave fragment[i] + chr(code[i])
    frags = F.split(col, r"&#[0-9]{1,7};", -1)
    codes = F.transform(
        F.regexp_extract_all(col, F.lit(r"&#([0-9]{1,7});"), 1),
        lambda c: c.cast("int"),
    )
    return F.when(~has, col).otherwise(
        F.concat(
            F.concat_ws(
                "",
                F.zip_with(
                    frags,
                    F.concat(codes, F.array(F.lit(None).cast("int"))),
                    lambda f, c: F.concat(
                        f,
                        F.when(
                            c.isNotNull() & (c >= 32) & (c <= 126),
                            F.char(c),
                        ).otherwise(
                            F.when(c.isNotNull(), F.lit(" ")).otherwise(
                                F.lit("")
                            )
                        ),
                    ),
                ),
            )
        )
    )


def strip_html(
    docs: DataFrame,
    html_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Rewrite (or add) a column with the extracted text. With
    ``out_col=None`` the html column is replaced in place, keeping the
    frame shape pipeline-compatible."""
    target = out_col or html_col
    return docs.withColumn(target, strip_html_expr(F.col(html_col)))
