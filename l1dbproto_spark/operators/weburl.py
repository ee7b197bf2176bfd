"""Web-URL curation operators: canonical-URL normalization, registrable-
domain extraction, URL-level dedup, and domain mix / blocklist filtering —
the crawl-curation layer a web-scale corpus passes through BEFORE text
cleaning (CCNet / RefinedWeb / C4 all run exactly this sequence: canonical
URL dedup first — the cheapest dedup there is — then per-domain blocklists
and mix reports; reference parity: the reference has no web layer, this is
extension surface like the rest of the LLM-pipeline family).

Everything is pure native column expressions (one regexp parse + array
functions) — no UDFs, no shuffles except the dedup/report aggregations —
so the curation pass rides the corpus scan at 100 TB and the dedup is one
uniform-key groupBy like ``dedup.exact_dedup_groups``.

Normalization contract (deterministic, engine-portable — the DuckDB
parity test re-derives it in SQL):

* scheme and host lowercased; the fragment dropped; userinfo
  (``user[:pass]@``) stripped — it names a session, not a resource, and
  keeping it would let ``https://x@evil.com/`` dodge a domain blocklist;
* default ports stripped (``:80`` for http, ``:443`` for https), any
  other explicit port kept;
* an empty path becomes ``/``; otherwise the path is kept VERBATIM
  (no dot-segment or percent-decoding games — those change semantics on
  real servers and belong to a fetcher, not a dedup key);
* tracking query parameters are dropped (``utm_*``, ``fbclid``,
  ``gclid``, ``msclkid``, ``mc_eid``, ``igshid``, ``ref``, ``ref_src``),
  the survivors are sorted byte-wise so param ORDER never splits a
  dedup group, and an emptied query drops its ``?``;
* a string that does not parse as ``scheme://host...`` normalizes to
  NULL — callers quarantine/count those, the dedup never groups them.

``registrable_domain`` is the pragmatic two-label rule with an explicit
second-level-suffix exception list (``co.uk``-style); it is NOT the full
public-suffix list (thousands of entries, revised monthly) — callers with
PSL-grade needs pass their own suffix frame to the blocklist join
instead. The exception list is a keyword argument, so extending it is a
call-site decision, not a code change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme://[userinfo@]host[:port][path][?query][#fragment] —
#: RE2-compatible (no backrefs), identical group semantics in Java regex
#: and DuckDB's RE2. Userinfo (user[:pass]@) is matched NON-capturing and
#: therefore STRIPPED by normalization: it names a session, not a
#: resource, and leaving it in the host group let `https://x@evil.com/`
#: bypass a domain blocklist and split dedup groups (r11 review find).
URL_RE = (
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://(?:[^/?#@]*@)?([^/?#:@]+)(?::([0-9]+))?"
    r"([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)

#: query params that identify a CLICK, not a resource — dropping them is
#: what lets the canonical-URL dedup fold campaign traffic to one page
TRACKING_PARAM_RE = (
    r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)"
    r"(=.*)?$"
)

#: common second-level registry suffixes (the co.uk family) — the
#: two-label rule would otherwise call every .co.uk site "co.uk"
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar", "com.sg",
    "co.in", "co.kr", "co.za", "co.nz",
)


def url_scheme(url: Column) -> Column:
    """Lowercased scheme; '' when the URL does not parse."""
    return F.lower(F.regexp_extract(url, URL_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host; '' when the URL does not parse."""
    return F.lower(F.regexp_extract(url, URL_RE, 2))


def url_path(url: Column) -> Column:
    """Path verbatim ('' when absent or unparseable)."""
    return F.regexp_extract(url, URL_RE, 4)


def url_query(url: Column) -> Column:
    """Raw query string without the '?' ('' when absent)."""
    return F.regexp_extract(url, URL_RE, 5)


def _clean_params(query: Column) -> Column:
    """Sorted array of non-tracking 'k=v' tokens from a raw query string."""
    return F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit(""))
            & ~F.regexp_like(p, F.lit(TRACKING_PARAM_RE)),
        )
    )


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract; NULL when the
    string does not parse as ``scheme://host...`` (quarantine upstream).
    One regexp parse feeding plain string/array expressions — stays
    inside whole-stage codegen."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = F.regexp_extract(url, URL_RE, 3)
    path = url_path(url)
    q = F.array_join(_clean_params(url_query(url)), "&")
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path_part, q_part))


def registrable_domain(
    host: Column,
    second_level_suffixes: tuple[str, ...] = SECOND_LEVEL_SUFFIXES,
) -> Column:
    """Registrable domain of a (lowercased) host: last two labels, or last
    THREE when the last two are a known second-level registry suffix
    (``a.b.co.uk`` -> ``b.co.uk``). Hosts with one label (or '') pass
    through unchanged. Heuristic by design — see module docstring."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return (
        F.when((n >= 3) & last2.isin(*second_level_suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def url_dedup_groups(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL exact dedup groups: (url_norm, keep_doc_id=min id,
    n_copies) — the same min-id-wins contract as
    ``dedup.exact_dedup_groups``, keyed on the normalized URL instead of
    the text fingerprint (catches refetches whose text differs by ads or
    timestamps, which text dedup misses). Unparseable URLs (url_norm
    NULL) are EXCLUDED — count them upstream. One uniform-key shuffle."""
    u = normalize_url(F.col(url_col))
    return (
        docs.select(F.col(id_col), u.alias("url_norm"))
        .filter(F.col("url_norm").isNotNull())
        .groupBy("url_norm")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def domain_mix_report(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per registrable domain: (domain, n_docs, n_hosts, share) — the
    corpus-balance report a crawl curator reads before setting per-domain
    quotas. share = n_docs / parseable total (exact int/int division in
    double — deterministic). Unparseable URLs are excluded and reported
    as the special domain ``__unparsed__`` with share over ALL rows, so
    the report never silently hides a feed of garbage URLs.

    One aggregation over the scan + a broadcast of the 1-row total —
    domains are the uniform key; a mega-domain is absorbed by map-side
    partial aggregation."""
    host = url_host(F.col(url_col))
    dom = F.when(host == "", F.lit("__unparsed__")).otherwise(
        registrable_domain(host)
    )
    per = docs.select(
        dom.alias("domain"),
        F.when(host == "", None).otherwise(host).alias("host"),
    ).groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("host").alias("n_hosts"),
    )
    # per the contract above: domain shares are over the PARSEABLE total
    # (quotas should not deflate with the garbage-URL fraction), while
    # __unparsed__'s share is over ALL rows (its job is "how much of the
    # feed is garbage"); r11 review find — the first cut divided both by
    # the all-rows total
    total = per.agg(
        F.sum(F.when(F.col("domain") != "__unparsed__", F.col("n_docs")))
        .alias("_parseable"),
        F.sum("n_docs").alias("_all"),
    )
    denom = F.when(
        F.col("domain") == "__unparsed__", F.col("_all")
    ).otherwise(F.col("_parseable"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_docs",
            "n_hosts",
            (F.col("n_docs").cast("double") / denom).alias("share"),
        )
    )


def filter_blocked_domains(
    docs: DataFrame,
    blocked: DataFrame | list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose registrable domain is on a blocklist.

    ``blocked`` is a one-column frame (``domain``) or a driver-side list.
    Frame form is a broadcast LEFT ANTI join (blocklists are
    bounded — thousands of rows — while the corpus is not); list form
    compiles to an ``isin`` predicate that rides the scan. Unparseable
    URLs are KEPT (they have no domain to match) — quarantine them with
    the ingest contract, not here."""
    dom = registrable_domain(url_host(F.col(url_col)))
    if isinstance(blocked, list):
        if not blocked:
            return docs
        # NULL-safe keep: a NULL url (or unparseable -> '' host) has no
        # domain to match — `~isin` alone evaluates to NULL on NULL input
        # and filter() would silently DROP those rows, diverging from the
        # frame form's anti-join (r11 review find)
        return docs.filter(
            dom.isNull() | ~dom.isin(*[b.lower() for b in blocked])
        )
    return (
        docs.withColumn("_dom", dom)
        .join(
            F.broadcast(
                blocked.select(F.lower(F.col("domain")).alias("_dom")).distinct()
            ),
            "_dom",
            "left_anti",
        )
        .drop("_dom")
    )
