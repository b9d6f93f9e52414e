"""operators/urltools.py: canonicalization / registrable-domain /
blocklist semantics the analytic oracle queries don't reach."""

from pyspark.sql import functions as F

from lightfusion_spark.operators import urltools


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(urltools.canonicalize_url("u").alias("c")).collect()[0]["c"]


def test_canonicalize_core_rules(spark):
    assert (
        _canon(spark, "HTTPS://WWW.Ex.COM:443/a/b?utm_source=x&b=2&a=1#frag")
        == "https://www.ex.com/a/b?a=1&b=2"
    )


def test_default_port_only_stripped_for_matching_scheme(spark):
    # :443 on http is NOT the default — it must survive.
    assert _canon(spark, "http://ex.com:443/x") == "http://ex.com:443/x"
    assert _canon(spark, "http://ex.com:80/x") == "http://ex.com/x"


def test_bare_root_and_empty_query(spark):
    assert _canon(spark, "https://ex.com/") == "https://ex.com"
    assert _canon(spark, "https://ex.com/?utm_campaign=only") == "https://ex.com"


def test_non_absolute_passthrough(spark):
    assert _canon(spark, "  /relative/path  ") == "/relative/path"


def test_path_case_preserved(spark):
    # only scheme+host lower; paths are case-sensitive resources.
    assert _canon(spark, "http://EX.com/CaseSensitive") == "http://ex.com/CaseSensitive"


def test_url_host_skips_userinfo_and_port(spark):
    df = spark.createDataFrame(
        [("https://user:pw@Sub.Ex.COM:8443/p",)], "u string"
    )
    assert (
        df.select(urltools.url_host(F.col("u")).alias("h")).collect()[0]["h"]
        == "sub.ex.com"
    )


def test_registrable_domain_second_level(spark):
    df = spark.createDataFrame(
        [("a.b.co.uk",), ("www.x.example.com",), ("localhost",), ("ex.org",)],
        "h string",
    )
    got = [
        r["d"]
        for r in df.select(
            urltools.registrable_domain(F.col("h")).alias("d")
        ).collect()
    ]
    assert got == ["b.co.uk", "example.com", "localhost", "ex.org"]


def test_blocklist_filters_subdomains_via_registrable_domain(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.bad.com/x"),
            (2, "https://cdn.bad.com/y"),
            (3, "https://good.org/z"),
        ],
        "id long, url string",
    )
    kept = urltools.filter_blocked_domains(df, "url", ["bad.com"])
    assert [r["id"] for r in kept.collect()] == [3]
    only_bad = urltools.filter_blocked_domains(df, "url", ["bad.com"], invert=True)
    assert sorted(r["id"] for r in only_bad.collect()) == [1, 2]
    # helper column must not leak into the output schema
    assert kept.columns == ["id", "url"]


def test_parse_robots_rules_from_fixture(spark):
    """The committed WARC archive's real robots.txt record must parse to
    exactly its one Disallow rule."""
    import os

    from lightfusion_spark.operators import ingest

    from lightfusion_spark.fixtures import fixture_path

    recs = ingest.read_warc(spark, fixture_path("data", "sample.warc.gz"))
    robots = recs.where(
        (F.col("warc_type") == "response")
        & F.col("target_uri").endswith("/robots.txt")
    ).select("target_uri", F.decode(F.col("payload"), "UTF-8").alias("body"))
    rules = urltools.parse_robots_rules(robots, "target_uri", "body").collect()
    assert [(r["host"], r["prefix"]) for r in rules] == [("example.com", "/private")]


def test_robots_filter_is_host_scoped_and_prefix_based(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://a.com/private/x"),   # disallowed
            (2, "https://a.com/public"),      # allowed
            (3, "https://b.com/private/x"),   # other host: allowed
            (4, "https://a.com/privateer"),   # prefix match: disallowed
        ],
        "id long, url string",
    )
    rules = spark.createDataFrame([("a.com", "/private")], "host string, prefix string")
    kept = urltools.filter_robots_disallowed(pages, "url", rules)
    assert sorted(r["id"] for r in kept.collect()) == [2, 3]
    assert kept.columns == ["id", "url"]


def test_robots_full_precedence_longest_match_wins(spark):
    """Google's published rule: longest matching prefix wins; on equal
    length Allow beats Disallow; no match means allowed."""
    pages = spark.createDataFrame(
        [
            (1, "https://a.com/private/public/x"),  # Allow /private/public (longer) wins
            (2, "https://a.com/private/secret"),    # only Disallow matches
            (3, "https://a.com/open"),              # no directive matches
            (4, "https://a.com/dual"),              # equal-length Allow vs Disallow -> Allow
        ],
        "id long, url string",
    )
    directives = spark.createDataFrame(
        [
            ("a.com", False, "/private"),
            ("a.com", True, "/private/public"),
            ("a.com", False, "/dual"),
            ("a.com", True, "/dual"),
        ],
        "host string, allow boolean, prefix string",
    )
    kept = urltools.filter_robots(pages, "url", directives)
    assert sorted(r["id"] for r in kept.collect()) == [1, 3, 4]
    assert kept.columns == ["id", "url"]


def test_robots_duplicate_pages_survive_filtering(spark):
    """ADVICE r7: filter_robots's winner window used to partition by every
    page column, so two IDENTICAL page rows fell in one partition and the
    rn==1 filter silently deduplicated the input.  Duplicates must ride
    through 1:1 when allowed."""
    pages = spark.createDataFrame(
        [(1, "https://a.com/ok"), (1, "https://a.com/ok"), (2, "https://a.com/private/x")],
        "id long, url string",
    )
    directives = spark.createDataFrame(
        [("a.com", False, "/private")], "host string, allow boolean, prefix string"
    )
    kept = urltools.filter_robots(pages, "url", directives)
    assert sorted(r["id"] for r in kept.collect()) == [1, 1]
    assert kept.columns == ["id", "url"]


def test_robots_blocks_root_page_after_canonicalization(spark):
    """ADVICE r7: canonicalize_url strips a bare root slash, leaving an
    EMPTY extracted path that never startswith('/') — a site-wide
    'Disallow: /' failed to block the host's root page.  The empty path
    now coalesces to '/' in both filter entry points."""
    pages = spark.createDataFrame(
        [(1, "https://a.com"), (2, "https://a.com/"), (3, "https://b.com")],
        "id long, url string",
    )
    rules = spark.createDataFrame([("a.com", "/")], "host string, prefix string")
    kept = urltools.filter_robots_disallowed(pages, "url", rules)
    assert sorted(r["id"] for r in kept.collect()) == [3]
    directives = spark.createDataFrame(
        [("a.com", False, "/")], "host string, allow boolean, prefix string"
    )
    kept2 = urltools.filter_robots(pages, "url", directives)
    assert sorted(r["id"] for r in kept2.collect()) == [3]


def test_parse_robots_directives_both_kinds(spark):
    df = spark.createDataFrame(
        [
            (
                "https://Ex.com/robots.txt",
                "User-agent: *\nDisallow: /tmp\nAllow: /tmp/ok\n\nCrawl-delay: 5",
            )
        ],
        "url string, body string",
    )
    rules = sorted(
        (r["host"], r["allow"], r["prefix"])
        for r in urltools.parse_robots_directives(df, "url", "body").collect()
    )
    assert rules == [("ex.com", False, "/tmp"), ("ex.com", True, "/tmp/ok")]
