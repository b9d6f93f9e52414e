"""URL canonicalization and domain-blocklist filtering.

Crawl curation dedupes and filters by URL long before content is
fetched or hashed: the same page is crawled under scheme/case/port/
tracking-param variants, and blocklist filtering (the UT1/adult-domain
recipe used by CommonCrawl-derived pipelines) works on registrable
domains, not raw hosts.  Everything here is a pure-JVM expression
chain — regexp + higher-order array functions, no Python crossing, no
shuffle — so it composes into scans at 100 TB for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking parameters dropped by canonicalization: the utm_* family by
#: prefix plus the usual client-id offenders.
TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "igshid")

#: Second-level public suffixes for the registrable-domain heuristic
#: (co.uk, com.au, …).  A deliberate approximation of the Public Suffix
#: List: the full PSL is a data file, not logic — swap this set for a
#: broadcast PSL table when exactness matters.
SECOND_LEVEL_SUFFIXES = ("co", "com", "net", "org", "gov", "ac", "edu")


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute URL, as one JVM expression.

    Rules (each one collapses a real-crawl duplicate class):

    * scheme and host lowercased (``HTTPS://WWW.Ex.COM`` ≡ ``https://www.ex.com``);
    * fragment dropped (never sent to the server);
    * default ports stripped (``:80`` for http, ``:443`` for https);
    * a bare root path ``/`` dropped (``ex.com/`` ≡ ``ex.com``);
    * tracking parameters removed (``utm_*`` + :data:`TRACKING_PARAMS`);
    * surviving query parameters sorted (order never changes the
      resource for idempotent GETs; sorting collapses permutations).

    Non-absolute inputs (no ``scheme://``) pass through trimmed —
    deciding what a relative URL means is the caller's context.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)

    def _keep(p: Column) -> Column:
        name = F.lower(F.substring_index(p, "=", 1))
        tracked = F.lit(False)
        for pref in TRACKING_PREFIXES:
            tracked = tracked | name.startswith(pref)
        return (p != "") & ~tracked & ~name.isin(*TRACKING_PARAMS)

    params = F.array_sort(F.filter(F.split(query, "&"), _keep))
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), hostport, path, qpart)
    return F.when(scheme == "", u).otherwise(canon)


def url_host(url: Column | str) -> Column:
    """Lowercased host (port stripped) of an absolute URL; '' otherwise."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*@)?([^/:?#]+)", 2)
    )


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1 approximation: the last two labels, or three when the
    middle one is a known second-level suffix (``a.b.co.uk`` →
    ``b.co.uk``; ``www.x.example.com`` → ``example.com``)."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    take3 = (n >= 3) & F.element_at(labels, -2).isin(*SECOND_LEVEL_SUFFIXES)
    return (
        F.when(
            take3,
            F.concat_ws(
                ".",
                F.element_at(labels, -3),
                F.element_at(labels, -2),
                F.element_at(labels, -1),
            ),
        )
        .when(
            n >= 2,
            F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
        )
        .otherwise(h)
    )


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame | list[str],
    *,
    invert: bool = False,
) -> DataFrame:
    """Drop (or with ``invert=True``, keep only) rows whose URL's
    registrable domain appears in a blocklist.

    ``blocked`` is a one-column DataFrame or a plain list of domains.
    Blocklists are small relative to the corpus (UT1's adult category is
    ~4M domains ≈ tens of MB) — the join side is explicitly
    ``broadcast``, so at 100 TB this is a map-side hash probe per row,
    no corpus shuffle.
    """
    spark = df.sparkSession
    if isinstance(blocked, list):
        bdf = spark.createDataFrame([(d,) for d in blocked], "domain string")
    else:
        bdf = blocked.toDF("domain")
    dom = registrable_domain(url_host(F.col(url_col)))
    tagged = df.withColumn("_rdomain", dom)
    how = "left_semi" if invert else "left_anti"
    return tagged.join(
        F.broadcast(bdf), tagged["_rdomain"] == bdf["domain"], how
    ).drop("_rdomain")


def parse_robots_rules(
    df: DataFrame, url_col: str, body_col: str
) -> DataFrame:
    """Extract ``(host, prefix)`` Disallow rules from robots.txt bodies.

    One row per non-empty ``Disallow:`` line; the host comes from the
    robots.txt's own URL.  Deliberate simplification (documented, like
    the PSL approximation): user-agent sections are not distinguished —
    every Disallow applies, the conservative reading a curation
    pipeline wants.  ``Allow:`` precedence and wildcards are the
    caller's extension point.  Pure JVM: split/explode/regexp.
    """
    body = F.col(body_col)
    line = F.explode(F.split(body, "\n")).alias("_line")
    prefix = F.trim(F.regexp_extract(F.col("_line"), r"(?i)^\s*Disallow\s*:\s*(\S+)", 1))
    return (
        df.select(url_host(F.col(url_col)).alias("host"), line)
        .select("host", prefix.alias("prefix"))
        .where(F.col("prefix") != "")
        .distinct()
    )


def _page_path(url_col: str):
    """A page URL's path for robots prefix matching, with the EMPTY path
    coalesced to ``'/'``: :func:`canonicalize_url` strips a bare root
    slash (``http://ex.com/`` -> ``http://ex.com``), and an empty
    extracted path never startswith ``'/'`` — a site-wide ``Disallow: /``
    would silently fail to block the host's root page (ADVICE r7)."""
    raw = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    return F.when(raw == "", F.lit("/")).otherwise(raw)


def filter_robots_disallowed(
    pages: DataFrame, url_col: str, rules: DataFrame
) -> DataFrame:
    """Drop pages whose path falls under a Disallow prefix for their
    host.  ``rules`` is ``(host, prefix)`` (see
    :func:`parse_robots_rules`) — small by nature (one robots.txt per
    host), so the join side broadcasts: a map-side probe per page, no
    corpus shuffle.
    """
    path = _page_path(url_col)
    tagged = pages.withColumn("_host", url_host(F.col(url_col))).withColumn(
        "_path", path
    )
    r = rules.select(F.col("host").alias("_rhost"), F.col("prefix").alias("_rprefix"))
    cond = (F.col("_host") == F.col("_rhost")) & F.col("_path").startswith(
        F.col("_rprefix")
    )
    return tagged.join(F.broadcast(r), cond, "left_anti").drop("_host", "_path")


def parse_robots_directives(
    df: DataFrame, url_col: str, body_col: str
) -> DataFrame:
    """Both robots.txt directive kinds as ``(host, allow, prefix)`` —
    the input :func:`filter_robots` needs for precedence (the
    Disallow-only :func:`parse_robots_rules` stays as the conservative
    gate).  Same all-agents simplification, same pure-JVM shape."""
    line = F.explode(F.split(F.col(body_col), "\n")).alias("_line")
    kind = F.lower(
        F.regexp_extract(F.col("_line"), r"(?i)^\s*(Allow|Disallow)\s*:", 1)
    )
    prefix = F.trim(
        F.regexp_extract(F.col("_line"), r"(?i)^\s*(?:Allow|Disallow)\s*:\s*(\S+)", 1)
    )
    return (
        df.select(url_host(F.col(url_col)).alias("host"), line)
        .select("host", (kind == "allow").alias("allow"), prefix.alias("prefix"))
        .where(F.col("prefix") != "")
        .distinct()
    )


def filter_robots(
    pages: DataFrame, url_col: str, directives: DataFrame
) -> DataFrame:
    """Robots filtering with the full precedence rule (Google's
    published semantics): among all directives whose prefix matches the
    page's path, the LONGEST wins; on equal length Allow beats
    Disallow; no matching directive means allowed.

    One broadcast join to the matching directives + one per-page window
    picking the winner — pages without any match ride the left join
    through untouched.  Each page is tagged with a unique surrogate row
    id BEFORE the join and the winner window partitions on that id
    alone: partitioning by every page column both silently deduplicated
    identical page rows (two equal rows fell into one partition and the
    ``_rn==1`` filter dropped one even when allowed) and shuffled on an
    arbitrarily wide key that can include full HTML payloads (ADVICE
    r7).  The id is per-evaluation only and never escapes.
    """
    from pyspark.sql.window import Window

    tagged = (
        pages.withColumn("_rid", F.monotonically_increasing_id())
        .withColumn("_host", url_host(F.col(url_col)))
        .withColumn("_path", _page_path(url_col))
    )
    d = directives.select(
        F.col("host").alias("_rhost"),
        F.col("allow").alias("_rallow"),
        F.col("prefix").alias("_rprefix"),
    )
    cond = (F.col("_host") == F.col("_rhost")) & F.col("_path").startswith(
        F.col("_rprefix")
    )
    joined = tagged.join(F.broadcast(d), cond, "left")
    w = Window.partitionBy(F.col("_rid")).orderBy(
        F.length(F.col("_rprefix")).desc(),
        F.col("_rallow").desc(),  # equal length: Allow wins
    )
    winner = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.col("_rallow").isNull() | F.col("_rallow"))
    )
    return winner.select(*pages.columns)
