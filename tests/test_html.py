"""HTML extraction (operators/html.py): independent Python re-mirror of
the pinned rule sequence, targeted structural cases, and pipeline
integration with the C4 line cleaner."""

from __future__ import annotations

import re

from l1dbproto_spark.operators.html import strip_html

_BLOCK = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote|pre|section"
    "|article|header|footer|title"
)


def _ref(s: str) -> str:
    x = re.sub(r"(?is)<(script|style|noscript)\b.*?</\1\s*>", " ", s)
    x = re.sub(r"(?s)<!--.*?-->", " ", x)
    x = re.sub(rf"(?i)</({_BLOCK})\s*>|<br\s*/?\s*>", "\n", x)
    x = re.sub(r"(?s)<[^>]*>", " ", x)
    # decimal BEFORE named, mirroring the engine: '&amp;#38;' unescapes
    # exactly one level (to '&#38;'), never two
    x = re.sub(
        r"&#([0-9]{1,7});",
        lambda m: chr(int(m.group(1)))
        if 32 <= int(m.group(1)) <= 126
        else " ",
        x,
    )
    for ent, rep in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ]:
        x = x.replace(ent, rep)
    x = re.sub(r"[ \t\r\f]+", " ", x)
    x = re.sub(r" ?\n ?", "\n", x)
    x = re.sub(r"\n{2,}", "\n", x)
    return x.strip()


PAGES = [
    "<html><head><title>My Page</title><style>p {color: red}</style>"
    "</head><body><h1>Header</h1><p>First para.</p><p>Second "
    "<b>bold</b> para.</p></body></html>",
    "<SCRIPT type='text/javascript'>var x = '<p>not text</p>';"
    "</SCRIPT>Visible<br/>line two<BR>line three",
    "<!-- hidden --><div>a &amp; b &lt;tag&gt; &quot;q&quot; &#65;&#66;"
    "&#10;&#8364; end</div>",
    "<ul><li>one</li><li>two</li></ul><table><tr><td>c1</td><td>c2"
    "</td></tr></table>",
    "plain text, no markup at all",
    "",
    "<p>double &amp;lt; escape</p>",
    "<p>fish &amp;#38; chips stay &amp; escaped once</p>",
    "<noscript>fallback</noscript><article>Body text.</article>"
    "<footer>(c) 2026</footer>",
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(
        list(enumerate(PAGES)), "doc_id long, text string"
    )
    got = {r.doc_id: r.text for r in strip_html(df).collect()}
    for i, page in enumerate(PAGES):
        assert got[i] == _ref(page), (i, got[i])


def test_structural_expectations(spark):
    df = spark.createDataFrame(
        list(enumerate(PAGES)), "doc_id long, text string"
    )
    got = {r.doc_id: r.text for r in strip_html(df).collect()}
    # script/style/comment contents gone
    assert "color" not in got[0] and "not text" not in got[1]
    assert "hidden" not in got[2]
    # block structure became lines
    assert got[0].splitlines() == [
        "My Page",
        "Header",
        "First para.",
        "Second bold para.",
    ]
    assert got[1].splitlines() == ["Visible", "line two", "line three"]
    assert got[3].splitlines() == ["one", "two", "c1 c2"]
    # entities: named + printable decimal decoded, non-printable dropped
    assert 'a & b <tag> "q" AB' in got[2] and "€" not in got[2]
    # one decode level only (no double-unescape)
    assert "&lt;" in got[6]
    # passthrough + empty
    assert got[4] == "plain text, no markup at all"
    assert got[5] == ""


def test_out_col_keeps_original(spark):
    df = spark.createDataFrame(
        [(1, "<p>hi</p>")], "doc_id long, text string"
    )
    out = strip_html(df, out_col="clean").collect()[0]
    assert out.text == "<p>hi</p>" and out.clean == "hi"


def test_composes_with_c4_clean(spark):
    from l1dbproto_spark.operators.c4 import c4_clean

    pages = [
        (
            1,
            "<p>This is a perfectly reasonable first sentence.</p>"
            "<p>Here is another good sentence with many words.</p>"
            "<p>And a third complete sentence ends the document.</p>",
        ),
        (2, "<script>spam()</script><p>short.</p>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    cleaned, log = c4_clean(strip_html(df), min_sentences=3)
    kept = {r.doc_id for r in cleaned.collect()}
    assert kept == {1}
