"""Web-URL curation operators (operators/weburl.py): normalization pins
over hand-built URLs covering every contract clause, registrable-domain
rules, blocklist filtering in both forms, and DuckDB parity for the
canonical-URL dedup + domain mix report over URLs synthesized from the
documents fixture (same injected-structure pattern as the line-dedup
oracle: the fixture has no URL column, so a deterministic one is derived
from doc_id and both engines re-derive the full rule)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.weburl import (
    TRACKING_PARAM_RE,
    URL_RE,
    domain_mix_report,
    filter_blocked_domains,
    normalize_url,
    registrable_domain,
    url_dedup_groups,
    url_host,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _norm_one(spark, url):
    return (
        spark.range(1)
        .select(normalize_url(F.lit(url)).alias("u"))
        .collect()[0]
        .u
    )


def test_normalize_url_contract_pins(spark):
    cases = {
        # scheme+host lowercase, fragment dropped, empty path -> /
        "HTTP://WWW.Example.COM#frag": "http://www.example.com/",
        # default ports stripped per scheme, others kept
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        "https://a.com:80/x": "https://a.com:80/x",  # 80 is not https default
        # tracking params dropped, survivors sorted, emptied query loses '?'
        "http://a.com/p?utm_source=tw&b=2&a=1": "http://a.com/p?a=1&b=2",
        "http://a.com/p?b=2&a=1&fbclid=xyz&gclid=1": "http://a.com/p?a=1&b=2",
        "http://a.com/p?utm_campaign=x": "http://a.com/p",
        # path verbatim (no decoding/dot games), valueless param kept
        "http://a.com/A/B%20c/./d?flag": "http://a.com/A/B%20c/./d?flag",
        # ref is tracking; x_ref is not (anchored name match)
        "http://a.com/p?ref=nav&x_ref=1": "http://a.com/p?x_ref=1",
        # userinfo stripped — it names a session, not a resource, and
        # would otherwise dodge domain blocklists (r11 review find)
        "https://x@evil.com/p": "https://evil.com/p",
        "http://u:p@a.com:80/x": "http://a.com/x",
        "http://a.com/a@b": "http://a.com/a@b",  # '@' in path is data
    }
    for raw, want in cases.items():
        assert _norm_one(spark, raw) == want, raw
    # unparseable -> NULL, never a dedup key
    for bad in ("not a url", "example.com/no-scheme", "http//missing.colon"):
        assert _norm_one(spark, bad) is None, bad


def test_registrable_domain_rules(spark):
    cases = {
        "www.blog.example.com": "example.com",
        "example.com": "example.com",
        "a.b.shop.co.uk": "shop.co.uk",
        "co.uk": "co.uk",  # two labels that ARE a suffix: nothing below them
        "localhost": "localhost",
        "": "",
    }
    rows = spark.createDataFrame(
        [(h,) for h in cases], "host string"
    ).select("host", registrable_domain(F.col("host")).alias("d"))
    got = {r.host: r.d for r in rows.collect()}
    assert got == cases


def test_filter_blocked_domains_both_forms(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://spam.tracker.co.uk/x"),
            (2, "https://good.example.com/y"),
            (3, "http://sub.good.example.com/z"),  # same registrable domain
            (4, "garbage-url"),  # unparseable: KEPT (no domain to match)
            (5, None),  # NULL url: KEPT in BOTH forms (r11 review find —
            #             the list form's bare ~isin dropped it)
            (6, "https://attacker@good.example.com/w"),  # userinfo can't dodge
        ],
        "doc_id long, url string",
    )
    want_kept = {1, 4, 5}  # example.com blocked (covers docs 2, 3, and 6)
    got_list = {
        r.doc_id
        for r in filter_blocked_domains(docs, ["Example.COM"]).collect()
    }
    assert got_list == want_kept
    frame = spark.createDataFrame([("EXAMPLE.com",)], "domain string")
    got_frame = {
        r.doc_id for r in filter_blocked_domains(docs, frame).collect()
    }
    assert got_frame == want_kept
    assert filter_blocked_domains(docs, []).count() == 6
    # the frame form must be a broadcast anti join, never a shuffle of the corpus
    plan = (
        filter_blocked_domains(docs, frame)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# --- DuckDB parity: both engines re-derive normalization + dedup + mix ----

# deterministic URL injected over the documents fixture: exercises scheme
# case, default/explicit ports, tracking params in shuffled order, and
# fragments — all of which must FOLD into one canonical form per
# (doc_id%7, doc_id%50, doc_id%11==0) triple
_SPARK_URL = None  # built in _with_urls


def _with_urls(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    i = F.col("doc_id")
    scheme = F.when(i % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http"))
    host = F.concat(
        F.lit("W"),
        (i % 7).cast("string"),
        F.lit(".ExAmple."),
        F.when(i % 11 == 0, F.lit("CO.UK")).otherwise(F.lit("com")),
    )
    port = F.when(i % 4 == 0, F.lit(":80")).otherwise(F.lit(""))
    path = F.concat(F.lit("/p/"), (i % 50).cast("string"))
    query = (
        F.when(i % 3 == 0, F.lit("?b=2&a=1"))
        .when(i % 3 == 1, F.lit("?a=1&utm_source=x&b=2"))
        .otherwise(F.lit("?a=1&b=2"))
    )
    frag = F.when(i % 5 == 0, F.lit("#top")).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(scheme, F.lit("://"), host, port, path, query, frag).alias("url")
    )


_DUCK_URL = """
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END)
           || '://W' || CAST(doc_id % 7 AS VARCHAR) || '.ExAmple.'
           || (CASE WHEN doc_id % 11 = 0 THEN 'CO.UK' ELSE 'com' END)
           || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END)
           || '/p/' || CAST(doc_id % 50 AS VARCHAR)
           || (CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1'
                    WHEN doc_id % 3 = 1 THEN '?a=1&utm_source=x&b=2'
                    ELSE '?a=1&b=2' END)
           || (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS url
    FROM documents
"""


def _duck_norm_cte():
    return f"""
    u AS ({_DUCK_URL}),
    p AS (
      SELECT doc_id,
             lower(regexp_extract(url, '{URL_RE}', 1)) AS scheme,
             lower(regexp_extract(url, '{URL_RE}', 2)) AS host,
             regexp_extract(url, '{URL_RE}', 3) AS port,
             regexp_extract(url, '{URL_RE}', 4) AS path,
             regexp_extract(url, '{URL_RE}', 5) AS q
      FROM u
    ),
    n AS (
      SELECT doc_id, host,
             scheme || '://' || host
             || (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                        OR (scheme = 'https' AND port = '443')
                 THEN '' ELSE ':' || port END)
             || (CASE WHEN path = '' THEN '/' ELSE path END)
             || (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS url_norm
      FROM (
        SELECT *, array_to_string(list_sort(list_filter(
                 string_split(q, '&'),
                 x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')
               )), '&') AS qs
        FROM p
      )
    )
    """


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    yield con
    con.close()


def test_url_dedup_groups_matches_duckdb(spark, duck):
    got = {
        (r.url_norm, r.keep_doc_id, r.n_copies)
        for r in url_dedup_groups(_with_urls(spark)).collect()
    }
    want = {
        tuple(t)
        for t in duck.execute(
            f"""
            WITH {_duck_norm_cte()}
            SELECT url_norm, MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS n_copies
            FROM n GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0
    # the injected variants actually folded: fewer groups than docs
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert len(got) < n_docs


def test_domain_mix_report_matches_duckdb(spark, duck):
    got = {
        (r.domain, r.n_docs, r.n_hosts, r.share)
        for r in domain_mix_report(_with_urls(spark)).collect()
    }
    want = {
        tuple(t)
        for t in duck.execute(
            f"""
            WITH {_duck_norm_cte()},
            d AS (
              SELECT CASE
                       WHEN host[-6:] = '.co.uk'
                       THEN string_split(host, '.')[-3] || '.co.uk'
                       ELSE string_split(host, '.')[-2] || '.'
                            || string_split(host, '.')[-1]
                     END AS domain,
                     host
              FROM n
            ),
            per AS (
              SELECT domain, COUNT(*) AS n_docs,
                     COUNT(DISTINCT host) AS n_hosts
              FROM d GROUP BY 1
            )
            SELECT domain, n_docs, n_hosts,
                   CAST(n_docs AS DOUBLE)
                     / (SELECT SUM(n_docs) FROM per) AS share
            FROM per
            """
        ).fetchall()
    }
    assert got == want and len(got) == 2  # example.com and example.co.uk


def test_domain_mix_report_unparsed_denominators(spark):
    """Domain shares are over the PARSEABLE total (quotas must not
    deflate with the garbage fraction); __unparsed__'s share is over ALL
    rows (it measures the garbage fraction itself) — r11 review find,
    previously both divided by the all-rows total."""
    docs = spark.createDataFrame(
        [(i, "https://a.com/x") for i in range(3)]
        + [(10 + i, "https://b.com/y") for i in range(1)]
        + [(20 + i, "garbage") for i in range(4)],
        "doc_id long, url string",
    )
    got = {r.domain: r for r in domain_mix_report(docs).collect()}
    assert got["a.com"].share == 3 / 4  # of 4 parseable
    assert got["b.com"].share == 1 / 4
    assert got["__unparsed__"].share == 4 / 8  # of all 8 rows
    assert got["__unparsed__"].n_hosts == 0
