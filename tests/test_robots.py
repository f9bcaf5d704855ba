"""robots.txt parse + match semantics (sources/robots.py): group
shadowing, longest-match / Allow-wins-ties, defaults, and the
URL-side JVM match plan."""

from __future__ import annotations

from data_lake_skyfit_spark.sources.robots import (
    parse_robots,
    robots_filter,
    robots_rules,
)

ROBOTS = """\
# the good crawler rules
User-agent: goodbot
User-agent: otherbot
Disallow: /secret
Allow: /secret/ok

User-agent: *
Disallow: /private
Disallow:
Crawl-delay: 10
"""


def test_parse_robots_group_semantics():
    # exact-agent group shadows '*' entirely (most-specific-group rule)
    assert parse_robots(ROBOTS, "goodbot") == [("/secret", False), ("/secret/ok", True)]
    assert parse_robots(ROBOTS, "otherbot") == [("/secret", False), ("/secret/ok", True)]
    # unknown agent falls to '*'; empty Disallow and Crawl-delay are no-ops
    assert parse_robots(ROBOTS, "randombot") == [("/private", False)]
    # comments-only / empty file -> no rules
    assert parse_robots("# nothing here\n\n", "*") == []
    assert parse_robots("", "*") == []
    # rules before any User-agent line attach to no group
    assert parse_robots("Disallow: /x\nUser-agent: *\nAllow: /y\n", "*") == [("/y", True)]


def test_robots_filter_longest_match_and_ties(spark):
    urls = spark.createDataFrame(
        [
            (1, "http://a.test/private/x"),  # disallowed by /private
            (2, "http://a.test/private/open/y"),  # allowed: longer Allow
            (3, "http://a.test/public"),  # no match -> allowed
            (4, "http://a.test/dup"),  # equal-length Allow+Disallow -> Allow
            (5, "http://unknown.test/anything"),  # unknown host -> allowed
            (6, "not a url 6"),  # hostless -> allowed, host ''
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [
            ("a.test", "/private", False, 8),
            ("a.test", "/private/open", True, 13),
            ("a.test", "/dup", True, 4),
            ("a.test", "/dup", False, 4),
        ],
        "host string, prefix string, allow boolean, rule_len int",
    )
    out = {r["doc_id"]: r for r in robots_filter(urls, rules).collect()}
    assert out[1]["allowed"] is False and out[1]["matched_prefix"] == "/private"
    assert out[2]["allowed"] is True and out[2]["matched_len"] == 13
    assert out[3]["allowed"] is True and out[3]["matched_prefix"] == ""
    assert out[4]["allowed"] is True  # Allow wins the tie
    assert out[5]["allowed"] is True
    assert out[6]["allowed"] is True and out[6]["host"] == ""
    assert len(out) == 6  # one decision row per input row


def test_robots_rules_kernel_on_spark(spark):
    hosts = spark.createDataFrame(
        [("h.test", ROBOTS), ("empty.test", "# none\n"), ("null.test", None)],
        "host string, robots_txt string",
    )
    rows = {(r["host"], r["prefix"]): r for r in robots_rules(hosts).collect()}
    assert rows[("h.test", "/private")]["allow"] is False
    assert rows[("h.test", "/private")]["rule_len"] == 8
    # '*' group only (default agent); goodbot group rules not emitted
    assert ("h.test", "/secret") not in rows
    assert not [k for k in rows if k[0] != "h.test"]


def test_parse_robots_empty_exact_group_shadows_star():
    """code-review r4c: an exact-agent group with NO path rules (only
    Crawl-delay / empty Disallow) still shadows '*' — 'these are your
    rules: none' means allowed everything, not the generic Disallows."""
    txt = "User-agent: mybot\nCrawl-delay: 5\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots(txt, "mybot") == []
    assert parse_robots(txt, "elsebot") == [("/", False)]
    txt2 = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots(txt2, "mybot") == []


def test_sitemap_locs_extraction(spark):
    from data_lake_skyfit_spark.sources.sitemap import sitemap_locs
    from pyspark.sql import functions as F

    xml = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>\n  http://a.test/sitemap1.xml\n</loc></sitemap>"
        "<sitemap><loc>http://a.test/sitemap2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    plain = "<urlset><url><loc>http://b.test/x</loc></url><url><loc></loc></url></urlset>"
    df = spark.createDataFrame([(1, xml), (2, plain), (3, "not xml"), (4, None)],
                               "doc_id long, xml string")
    out = {r["doc_id"]: r["locs"] and list(r["locs"])
           for r in df.select("doc_id", sitemap_locs("xml").alias("locs")).collect()}
    assert out[1] == ["http://a.test/sitemap1.xml", "http://a.test/sitemap2.xml"]
    assert out[2] == ["http://b.test/x"]  # empty loc dropped
    assert out[3] == []
    assert out[4] is None
