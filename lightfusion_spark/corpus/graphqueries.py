"""Web-graph corpus queries: link extraction + PageRank host ranking.

Round-7 addition to SURVEY §2.4's curation family (the reference has no
graph surface; CommonCrawl-derived pretraining pipelines rank hosts by
link centrality before sampling).  Two verified faces:

* ``pipe_web_links`` — real extraction: the committed WARC fixture's
  HTML pages through :func:`operators.webgraph.extract_links`, checked
  against the analytically-derived expectation table (the href in the
  page template resolves root-relative to the page's own URI — computed
  by the fixture *generator*, never by the extractor);
* ``pipe_web_pagerank`` — a deterministic formula graph over
  ``documents`` (so every sf has it) through 5 fixed power iterations;
  the DuckDB oracle replays all 5 iterations as an unrolled CTE chain
  with the same exact-DECIMAL sums, so the final doubles are
  bit-identical and the FLOOR(rank*1e9) output hashes exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators import urltools, webgraph
from .pipeline import _WARC_EXPECTED, _WARC_FIXTURE
from .registry import register
from .util import table

#: Formula graph: hosts are doc_id mod 60; every non-dangling host s
#: (s % 10 != 0 — six hosts keep NO out-links, exercising the dangling-
#: mass redistribution) links to (7s+k) mod 60 for k in 1..3.  7 is
#: coprime to 60, so every host has in-links and the graph is connected
#: enough for ranks to spread in 5 iterations.
_N_HOSTS = 60


def _pagerank_ctes(iters: int, damping: str = "0.85"):
    """Unrolled fixed-iteration PageRank CTE chain (DuckDB); returns
    (cte_sql, final_rank_cte_name) so multiple query tails share it.

    Arithmetic contract shared with ``operators.webgraph.pagerank``:
    per-node contribution sums and the dangling mass are exact
    ``DECIMAL(38,20)`` sums cast back to DOUBLE (associative, so
    partition order can't flip a bit); the update is evaluated in the
    identical operation order ``base + d*(contrib + dm/n)`` with every
    literal cast to DOUBLE (DuckDB would otherwise compute 1.0-0.85 in
    DECIMAL and diverge from IEEE doubles).

    Each ``pr{i}`` is ``AS MATERIALIZED``: DuckDB inlines a CTE at
    every reference, and with two consumers per iteration (``dm{i+1}``
    and ``c{i+1}``) the plan otherwise re-evaluates the whole chain
    ~4× per extra round — measured 0.19/0.7/3.2 s at 3/4/5 iterations,
    0.1 s materialized.  Evaluation count only; the arithmetic and
    values are untouched.
    """
    d = f"CAST({damping} AS DOUBLE)"
    parts = [
        f"""WITH e0 AS (
      SELECT DISTINCT (doc_id % {_N_HOSTS}) AS src,
             ((doc_id % {_N_HOSTS}) * 7 + k.k) % {_N_HOSTS} AS dst
      FROM documents CROSS JOIN (VALUES (1), (2), (3)) AS k(k)
      WHERE (doc_id % {_N_HOSTS}) % 10 <> 0
        AND (doc_id % {_N_HOSTS}) <> ((doc_id % {_N_HOSTS}) * 7 + k.k) % {_N_HOSTS}
    ),
    nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM e0 GROUP BY src),
    pr0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        parts.append(
            f"""dm{i} AS (
      SELECT COALESCE(CAST(SUM(CAST(rank AS DECIMAL(38,20))) AS DOUBLE),
                      CAST(0 AS DOUBLE)) AS dm
      FROM {p} WHERE node NOT IN (SELECT src FROM deg)
    ),
    c{i} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(p.rank / d.deg AS DECIMAL(38,20))) AS DOUBLE) AS contrib
      FROM e0 e JOIN {p} p ON p.node = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    pr{i} AS MATERIALIZED (
      SELECT n.node,
             (CAST(1.0 AS DOUBLE) - {d}) / (SELECT n FROM nn)
             + {d} * (COALESCE(c.contrib, CAST(0 AS DOUBLE))
                      + (SELECT dm FROM dm{i}) / (SELECT n FROM nn)) AS rank
      FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
    )"""
        )
    return ",\n    ".join(parts), f"pr{iters}"


def _pagerank_oracle(iters: int, damping: str = "0.85") -> str:
    body, fin = _pagerank_ctes(iters, damping)
    return (
        body
        + f"""
    SELECT node AS host, CAST(FLOOR(rank * 1e9) AS BIGINT) AS rank_e9
    FROM {fin}"""
    )


@register(
    "pipe_web_pagerank",
    oracle=_pagerank_oracle(5),
    doc="PageRank host ranking, the web-graph quality prior of "
    "CommonCrawl-derived curation: a 60-host formula graph (6 dangling "
    "hosts exercise the mass-redistribution term) through 5 fixed power "
    "iterations of operators/webgraph.py:pagerank — one equi-join + one "
    "exact-DECIMAL aggregation per round, dangling mass as a broadcast "
    "1-row relation, never a per-iteration collect.  The oracle unrolls "
    "all 5 iterations as a CTE chain with the identical arithmetic, so "
    "the FLOOR(rank*1e9) outputs hash exactly",
)
def pipe_web_pagerank(spark, sf_dir):
    ranks = webgraph.pagerank(_formula_edges(spark, sf_dir), iterations=5)
    return ranks.select(
        F.col("node").alias("host"),
        F.floor(F.col("rank") * F.lit(1e9)).cast("bigint").alias("rank_e9"),
    )


#: PPR seed hosts for the face: node % 12 == 3 → {3, 15, 27, 39, 51},
#: five non-dangling hosts (none is % 10 == 0), so the seed set both
#: emits and receives mass.
_PPR_SEED_PRED = "node % 12 = 3"


def _ppr_oracle(iters: int, damping: str = "0.85") -> str:
    """Unrolled fixed-iteration PERSONALIZED PageRank CTE chain: the
    same exact-DECIMAL / IEEE-operation-order contract as
    :func:`_pagerank_ctes`, with teleport and dangling mass landing on
    the seed set only (CASE per node, ns replacing n in both terms).

    Each ``pr{i}`` is ``AS MATERIALIZED``: DuckDB otherwise INLINES a
    CTE at every reference, and with two consumers per iteration
    (``dm{i+1}`` and ``c{i+1}``) the plan re-evaluates the whole chain
    ~4× per extra round — measured 0.23 s at 3 iterations and minutes
    at 5.  Materialization evaluates each round once (same arithmetic,
    same values — it only pins evaluation count, not operation order).
    """
    d = f"CAST({damping} AS DOUBLE)"
    base = _pagerank_ctes(0)[0]  # e0 / nodes / nn / deg / pr0 prefix
    # replace the uniform pr0 with the seed-indicator start; keep the
    # shared prefix up through deg verbatim.
    prefix = base[: base.rindex(",\n")]
    parts = [
        prefix,
        f"""ns AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes WHERE {_PPR_SEED_PRED}
    ),
    pr0 AS MATERIALIZED (
      SELECT node,
             CASE WHEN {_PPR_SEED_PRED}
                  THEN CAST(1.0 AS DOUBLE) / (SELECT n FROM ns)
                  ELSE CAST(0 AS DOUBLE) END AS rank
      FROM nodes
    )""",
    ]
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        parts.append(
            f"""dm{i} AS (
      SELECT COALESCE(CAST(SUM(CAST(rank AS DECIMAL(38,20))) AS DOUBLE),
                      CAST(0 AS DOUBLE)) AS dm
      FROM {p} WHERE node NOT IN (SELECT src FROM deg)
    ),
    c{i} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(p.rank / d.deg AS DECIMAL(38,20))) AS DOUBLE) AS contrib
      FROM e0 e JOIN {p} p ON p.node = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    pr{i} AS MATERIALIZED (
      SELECT n.node,
             CASE WHEN n.{_PPR_SEED_PRED}
                  THEN (CAST(1.0 AS DOUBLE) - {d}) / (SELECT n FROM ns)
                       + {d} * (COALESCE(c.contrib, CAST(0 AS DOUBLE))
                                + (SELECT dm FROM dm{i}) / (SELECT n FROM ns))
                  ELSE {d} * COALESCE(c.contrib, CAST(0 AS DOUBLE)) END AS rank
      FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
    )"""
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT node AS host, CAST(FLOOR(rank * 1e9) AS BIGINT) AS rank_e9
    FROM pr{iters}"""
    )


def _formula_edges(spark, sf_dir):
    """The shared 60-host formula graph (see `_N_HOSTS` note above)."""
    d = table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % _N_HOSTS).alias("src")
    )
    return (
        d.where((F.col("src") % 10) != 0)
        .select(
            "src", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k")
        )
        .select("src", ((F.col("src") * 7 + F.col("k")) % _N_HOSTS).alias("dst"))
        .distinct()
    )


@register(
    "pipe_web_ppr",
    oracle=_ppr_oracle(5),
    doc="personalized PageRank, the trusted-corpus EXPANSION prior "
    "(CCNet/OpenWebText shape: quality flows outward from vetted "
    "sources): the 60-host formula graph with hosts {3,15,27,39,51} "
    "seeded, 5 fixed power iterations of "
    "operators/webgraph.py:personalized_pagerank — teleport AND "
    "dangling mass land uniformly on the seed set only, so rank is "
    "proximity-to-seeds and a host unreachable from every seed scores "
    "exactly 0.  Same per-round shape as pagerank (one equi-join + one "
    "exact-DECIMAL aggregation; the seed flag rides the broadcast node "
    "relation).  The oracle unrolls all 5 iterations with the seed "
    "CASE in the identical IEEE operation order, so FLOOR(rank*1e9) "
    "hashes exactly",
)
def pipe_web_ppr(spark, sf_dir):
    edges = _formula_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .where((F.col("node") % 12) == 3)
        .distinct()
    )
    ranks = webgraph.personalized_pagerank(edges, seeds, iterations=5)
    return ranks.select(
        F.col("node").alias("host"),
        F.floor(F.col("rank") * F.lit(1e9)).cast("bigint").alias("rank_e9"),
    )


def _hits_oracle(iters: int) -> str:
    """Unrolled fixed-iteration HITS CTE chain: per round an
    exact-DECIMAL reinforcement sum and an exact-DECIMAL squared-norm
    fold, then one correctly-rounded IEEE sqrt + division each —
    hash-exact with NO rounding step anywhere.  The per-round vector
    CTEs are ``AS MATERIALIZED`` for the same inlining-blowup reason
    as :func:`_ppr_oracle` (here ``af{i}``/``hf{i}`` each have two
    consumers: the norm fold and the normalized projection)."""
    base = _pagerank_ctes(0)[0]
    prefix = base[: base.rindex(",\n")]  # e0 / nodes / nn / deg, drop pr0
    parts = [
        prefix,
        """h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM nodes)""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""ar{i} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(p.h AS DECIMAL(38,20))) AS DOUBLE) AS raw
      FROM e0 e JOIN h{i - 1} p ON p.node = e.src
      GROUP BY e.dst
    ),
    af{i} AS MATERIALIZED (
      SELECT n.node, COALESCE(ar.raw, CAST(0 AS DOUBLE)) AS raw
      FROM nodes n LEFT JOIN ar{i} ar ON ar.node = n.node
    ),
    an{i} AS (
      SELECT sqrt(CAST(SUM(CAST(raw * raw AS DECIMAL(38,20))) AS DOUBLE)) AS nrm
      FROM af{i}
    ),
    a{i} AS MATERIALIZED (
      SELECT node, raw / (SELECT nrm FROM an{i}) AS a FROM af{i}
    ),
    hr{i} AS (
      SELECT e.src AS node,
             CAST(SUM(CAST(p.a AS DECIMAL(38,20))) AS DOUBLE) AS raw
      FROM e0 e JOIN a{i} p ON p.node = e.dst
      GROUP BY e.src
    ),
    hf{i} AS MATERIALIZED (
      SELECT n.node, COALESCE(hr.raw, CAST(0 AS DOUBLE)) AS raw
      FROM nodes n LEFT JOIN hr{i} hr ON hr.node = n.node
    ),
    hn{i} AS (
      SELECT sqrt(CAST(SUM(CAST(raw * raw AS DECIMAL(38,20))) AS DOUBLE)) AS nrm
      FROM hf{i}
    ),
    h{i} AS MATERIALIZED (
      SELECT node, raw / (SELECT nrm FROM hn{i}) AS h FROM hf{i}
    )"""
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT h.node AS host,
           CAST(FLOOR(h.h * 1e9) AS BIGINT) AS hub_e9,
           CAST(FLOOR(a.a * 1e9) AS BIGINT) AS auth_e9
    FROM h{iters} h JOIN a{iters} a ON a.node = h.node"""
    )


@register(
    "pipe_web_hits",
    oracle=_hits_oracle(5),
    doc="HITS hubs-and-authorities (Kleinberg), PageRank's complement "
    "for crawl curation — frontier prioritization reads the hub score "
    "(what to crawl FROM), corpus sampling reads the authority score "
    "(what to KEEP): the 60-host formula graph through 5 fixed "
    "mutual-reinforcement rounds of operators/webgraph.py:hits, each "
    "an exact-DECIMAL sum fold + exact-DECIMAL squared-norm + ONE "
    "correctly-rounded IEEE sqrt and division (L2 normalization with "
    "no rounding step — sqrt is exact in IEEE-754, so the doubles are "
    "bit-identical across engines).  The oracle unrolls all 5 rounds; "
    "FLOOR(score*1e9) hashes exactly",
)
def pipe_web_hits(spark, sf_dir):
    edges = _formula_edges(spark, sf_dir)
    scores = webgraph.hits(edges, iterations=5)
    return scores.select(
        F.col("node").alias("host"),
        F.floor(F.col("hub") * F.lit(1e9)).cast("bigint").alias("hub_e9"),
        F.floor(F.col("authority") * F.lit(1e9)).cast("bigint").alias("auth_e9"),
    )


@register(
    "pipe_web_links",
    oracle=f"""
    SELECT record_idx, target_uri,
           'https://example.com/d/' || doc_id AS link
    FROM read_parquet('{_WARC_EXPECTED}')
    WHERE doc_id >= 0
    """,
    doc="real link extraction from raw crawl HTML: the committed WARC "
    "fixture's response records -> HTTP envelope split -> pure-JVM "
    "href regexp + root-relative resolution against the page origin "
    "(operators/webgraph.py:extract_links).  Each page's one template "
    "href (/d/<id>) must resolve to the page's own URI; the 404 page "
    "(no links) and the text/plain record (non-HTML, filtered by "
    "content type) must contribute nothing.  The oracle derives the "
    "expectation from the generator's table, never the extractor",
)
def pipe_web_links(spark, sf_dir):
    from ..operators import ingest

    recs = ingest.read_warc(spark, _WARC_FIXTURE)
    pages = recs.where(
        (F.col("warc_type") == "response")
        & F.col("http_content_type").contains("text/html")
    ).select(
        "record_idx",
        "target_uri",
        F.decode(F.col("payload"), "UTF-8").alias("html"),
    )
    return webgraph.extract_links(pages, "target_uri", "html")


def _messy_url_cols():
    """Deterministic messy-URL synthesis from doc_id — every
    canonicalization rule gets exercised: mixed-case scheme/host,
    default vs explicit ports, bare-root paths, tracking params,
    unsorted query, fragments.  The oracle computes the CANONICAL form
    analytically from doc_id (never by canonicalizing), so any rule
    regression breaks the hash."""
    did = F.col("doc_id")
    scheme_raw = F.when(did % 2 == 0, F.lit("http")).otherwise(F.lit("HTTPS"))
    tld_raw = (
        F.when(did % 4 == 0, F.lit("com"))
        .when(did % 4 == 1, F.lit("ORG"))
        .when(did % 4 == 2, F.lit("CO.UK"))
        .otherwise(F.lit("net"))
    )
    port_raw = (
        F.when((did % 3 == 0) & (did % 2 == 0), F.lit(":80"))
        .when((did % 3 == 0) & (did % 2 == 1), F.lit(":443"))
        .when(did % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path_raw = F.when(did % 5 == 0, F.lit("/")).otherwise(
        F.concat(F.lit("/p/"), did.cast("string"))
    )
    query_raw = F.concat(
        F.lit("?utm_source=t&z=1&id="), did.cast("string"), F.lit("&gclid=g")
    )
    frag_raw = F.when(did % 2 == 1, F.concat(F.lit("#sec"), did.cast("string"))).otherwise(
        F.lit("")
    )
    return F.concat(
        scheme_raw,
        F.lit("://WWW.Site"),
        (did % 25).cast("string"),
        F.lit(".Example."),
        tld_raw,
        port_raw,
        path_raw,
        query_raw,
        frag_raw,
    )


_URL_ORACLE_PARTS = """
      CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
      || '://www.site' || (doc_id % 25) || '.example.'
      || CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                         WHEN 2 THEN 'co.uk' ELSE 'net' END
      || CASE WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN '' ELSE '/p/' || doc_id END
      || '?id=' || doc_id || '&z=1'
"""

_DOMAIN_ORACLE = """
      CASE doc_id % 4 WHEN 0 THEN 'example.com' WHEN 1 THEN 'example.org'
                      WHEN 2 THEN 'example.co.uk' ELSE 'example.net' END
"""


@register(
    "pipe_url_canonicalize",
    oracle=f"""
    SELECT doc_id,
           {_URL_ORACLE_PARTS} AS url_canon,
           'www.site' || (doc_id % 25) || '.example.'
             || CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                                WHEN 2 THEN 'co.uk' ELSE 'net' END AS host,
           {_DOMAIN_ORACLE} AS domain
    FROM documents
    """,
    doc="URL canonicalization, the first dedup a crawl frontier runs: "
    "mixed-case scheme/host lowering, fragment drop, default-port strip "
    "(:80/:443 only when they match the scheme), bare-root-path drop, "
    "utm_*/gclid tracking-param removal, surviving-param sort — one "
    "pure-JVM expression chain (operators/urltools.py), no Python, no "
    "shuffle.  registrable_domain exercises the co.uk second-level "
    "branch.  The oracle builds the canonical form analytically from "
    "doc_id, never by canonicalizing",
)
def pipe_url_canonicalize(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id")
    messy = d.select("doc_id", _messy_url_cols().alias("url"))
    return messy.select(
        "doc_id",
        urltools.canonicalize_url("url").alias("url_canon"),
        urltools.url_host(F.col("url")).alias("host"),
        urltools.registrable_domain(urltools.url_host(F.col("url"))).alias("domain"),
    )


@register(
    "pipe_url_blocklist",
    oracle=f"""
    SELECT {_DOMAIN_ORACLE} AS domain, COUNT(*) AS n_kept
    FROM documents
    WHERE doc_id % 4 IN (0, 1)
    GROUP BY 1
    """,
    doc="domain-blocklist filtering (the UT1-style curation gate): "
    "registrable-domain extraction + broadcast LEFT ANTI against the "
    "blocked set — a map-side hash probe per row at 100 TB, no corpus "
    "shuffle.  example.co.uk and example.net are blocked; the oracle "
    "keeps doc_id%4 in (0,1) analytically",
)
def pipe_url_blocklist(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id")
    messy = d.select("doc_id", _messy_url_cols().alias("url"))
    kept = urltools.filter_blocked_domains(
        messy, "url", ["example.co.uk", "example.net"]
    )
    return kept.groupBy(
        urltools.registrable_domain(urltools.url_host(F.col("url"))).alias("domain")
    ).agg(F.count(F.lit(1)).alias("n_kept"))


def _rank_sample_oracle(iters: int = 5, base_rate: str = "0.5", seed: int = 7) -> str:
    body, fin = _pagerank_ctes(iters)
    return (
        body
        + f""",
    nhosts AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nh FROM nodes),
    rates AS (
      SELECT node AS host,
             ROUND(LEAST(CAST(1.0 AS DOUBLE),
                         rank * (SELECT nh FROM nhosts) * CAST({base_rate} AS DOUBLE)),
                   6) AS keep_rate
      FROM {fin}
    ),
    docs AS (
      SELECT doc_id, doc_id % {_N_HOSTS} AS host,
             ROUND((CAST('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)),
                                        1, 14) AS BIGINT)
                    % 1000000) / CAST(1000000 AS DOUBLE), 6) AS u
      FROM documents
    )
    SELECT r.host, r.keep_rate, COUNT(*) AS n_kept
    FROM docs d JOIN rates r ON r.host = d.host
    WHERE d.u < r.keep_rate
    GROUP BY 1, 2"""
    )


@register(
    "pipe_web_rank_sample",
    oracle=_rank_sample_oracle(),
    doc="PageRank as a curation prior (the RefinedWeb/CCNet shape: crawl "
    "mass follows host quality): per-host keep threshold "
    "round(least(1, rank*n*base_rate), 6) — mean rate stays base_rate, "
    "rank only redistributes it — and a row survives iff the "
    "deterministic mixture_sample hash-uniform u(doc_id, seed) falls "
    "under its host's threshold.  n_hosts and the rates are broadcast "
    "1-row/tiny relations; the corpus never reshuffles.  The oracle "
    "replays the full 5-iteration rank chain AND the md5 uniform",
)
def pipe_web_rank_sample(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % _N_HOSTS).alias("host")
    )
    ranks = webgraph.pagerank(_formula_edges(spark, sf_dir), iterations=5)
    kept = webgraph.rank_weighted_sample(
        d, ranks, "host", "doc_id", base_rate=0.5, seed=7
    )
    return kept.groupBy("host", "keep_rate").agg(
        F.count(F.lit(1)).alias("n_kept")
    )


@register(
    "pipe_web_robots",
    oracle=f"""
    SELECT record_idx, target_uri
    FROM read_parquet('{_WARC_EXPECTED}')
    WHERE doc_id = -1
       OR (doc_id >= 0 AND CAST(doc_id AS VARCHAR) NOT LIKE '1%')
    """,
    doc="robots.txt-aware page filtering over the raw crawl: the "
    "fixture's real robots.txt record is PARSED (Disallow: /private — "
    "host from the record's own URL) and a second synthetic rule "
    "(example.com, /d/1) is unioned in so the filter demonstrably "
    "drops pages (the 111 /d/1-prefixed docs) while the real rule "
    "matches nothing and the 404 page survives.  Rules broadcast; the "
    "anti-join is a map-side probe per page "
    "(operators/urltools.py:parse_robots_rules/filter_robots_disallowed)",
)
def pipe_web_robots(spark, sf_dir):
    from ..operators import ingest

    recs = ingest.read_warc(spark, _WARC_FIXTURE)
    robots = recs.where(
        (F.col("warc_type") == "response")
        & F.col("target_uri").endswith("/robots.txt")
    ).select(
        "target_uri", F.decode(F.col("payload"), "UTF-8").alias("body")
    )
    rules = urltools.parse_robots_rules(robots, "target_uri", "body").union(
        spark.createDataFrame([("example.com", "/d/1")], "host string, prefix string")
    )
    pages = recs.where(
        (F.col("warc_type") == "response")
        & F.col("http_content_type").contains("text/html")
    ).select("record_idx", "target_uri")
    return urltools.filter_robots_disallowed(pages, "target_uri", rules)


@register(
    "pipe_robots_precedence",
    oracle=f"""
    WITH pages AS (
      -- doc_id -2 is the robots.txt record itself: present in the
      -- expectation table but not an HTML page, so not in the face's input
      SELECT record_idx, target_uri FROM read_parquet('{_WARC_EXPECTED}')
      WHERE doc_id >= -1
    ),
    d(host, allow, prefix) AS (
      VALUES ('example.com', FALSE, '/private'),
             ('example.com', FALSE, '/d/1'),
             ('example.com', TRUE,  '/d/11'),
             ('example.com', TRUE,  '/d/12'),
             ('example.com', FALSE, '/d/12')
    ),
    p AS (
      SELECT record_idx, target_uri,
             lower(regexp_extract(target_uri,
               '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1)) AS host,
             CASE WHEN regexp_extract(target_uri,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(target_uri,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) END AS path
      FROM pages
    ),
    j AS (
      SELECT p.record_idx, p.target_uri, d.allow, d.prefix
      FROM p LEFT JOIN d ON p.host = d.host AND starts_with(p.path, d.prefix)
    ),
    w AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY record_idx
        ORDER BY length(prefix) DESC, allow DESC) AS rn
      FROM j
    )
    SELECT record_idx, target_uri FROM w
    WHERE rn = 1 AND (allow IS NULL OR allow)
    """,
    doc="robots.txt FULL-precedence gate (Google's published semantics — "
    "longest matching prefix wins, Allow beats Disallow on equal "
    "length, no match means allowed) over the raw crawl: the fixture's "
    "real Disallow:/private is parsed from its robots.txt record and "
    "synthetic Allow/Disallow directives are unioned in so every "
    "precedence branch is exercised — /d/1* drops (111 pages), except "
    "/d/11* which a LONGER Allow rescues and /d/12* where Allow wins "
    "the equal-length tie (22 survivors back).  Oracle replays the "
    "winner window per page; operator is "
    "operators/urltools.py:filter_robots (broadcast directives, "
    "surrogate-key winner window, ADVICE-r7 hardened).  Previously "
    "pytest-only — round-9 driver face per the round-8 verdict",
)
def pipe_robots_precedence(spark, sf_dir):
    from ..operators import ingest

    recs = ingest.read_warc(spark, _WARC_FIXTURE)
    robots = recs.where(
        (F.col("warc_type") == "response")
        & F.col("target_uri").endswith("/robots.txt")
    ).select(
        "target_uri", F.decode(F.col("payload"), "UTF-8").alias("body")
    )
    directives = urltools.parse_robots_directives(
        robots, "target_uri", "body"
    ).union(
        spark.createDataFrame(
            [
                ("example.com", False, "/d/1"),
                ("example.com", True, "/d/11"),
                ("example.com", True, "/d/12"),
                ("example.com", False, "/d/12"),
            ],
            "host string, allow boolean, prefix string",
        )
    )
    pages = recs.where(
        (F.col("warc_type") == "response")
        & F.col("http_content_type").contains("text/html")
    ).select("record_idx", "target_uri")
    return urltools.filter_robots(pages, "target_uri", directives)


def _lpa_oracle(iters: int) -> str:
    """Unrolled synchronous label-propagation replay (DuckDB): the
    60-host formula graph symmetrized, every node its own label at
    round 0, then per round a (node, label) neighbor-vote count and a
    ROW_NUMBER argmax (cnt DESC, label ASC — the deterministic
    tie-break).  All integer arithmetic: nothing to round, so the face
    is hash-exact by construction.  Label CTEs are ``AS MATERIALIZED``
    for the same inlining-blowup reason as the pagerank/PPR/HITS
    chains (each l{i} is referenced twice in round i+1)."""
    parts = [
        f"""WITH e0 AS (
      SELECT DISTINCT (doc_id % {_N_HOSTS}) AS src,
             ((doc_id % {_N_HOSTS}) * 7 + k.k) % {_N_HOSTS} AS dst
      FROM documents CROSS JOIN (VALUES (1), (2), (3)) AS k(k)
      WHERE (doc_id % {_N_HOSTS}) % 10 <> 0
        AND (doc_id % {_N_HOSTS}) <> ((doc_id % {_N_HOSTS}) * 7 + k.k) % {_N_HOSTS}
    ),
    es AS MATERIALIZED (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst AS a, src AS b FROM e0
      ) u WHERE a <> b
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS community FROM es)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""v{i} AS (
      SELECT e.b AS node, l.community, COUNT(*) AS cnt
      FROM es e JOIN l{i - 1} l ON l.node = e.a
      GROUP BY e.b, l.community
    ),
    l{i} AS MATERIALIZED (
      SELECT node, community FROM (
        SELECT node, community,
               ROW_NUMBER() OVER (
                 PARTITION BY node ORDER BY cnt DESC, community ASC
               ) AS rn
        FROM v{i}
      ) t WHERE rn = 1
    )"""
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT node AS host, community FROM l{iters}"""
    )


@register(
    "pipe_web_lpa",
    oracle=_lpa_oracle(4),
    doc="label-propagation communities (Raghavan 2007), the link-"
    "neighborhood grouping signal beside pagerank's ranking: the "
    "60-host formula graph symmetrized, 4 fixed synchronous rounds of "
    "operators/webgraph.py:label_propagation — every node starts as "
    "its own label and simultaneously adopts its neighbors' most "
    "frequent label, ties to the SMALLEST (no RNG, no visit order — "
    "partition-invariant).  Per round: one equi-join + one (node, "
    "label) count + a map-side-combinable min_by argmax.  The oracle unrolls all "
    "4 rounds with the identical integer arithmetic, so the face is "
    "hash-exact with no rounding at all",
)
def pipe_web_lpa(spark, sf_dir):
    labels = webgraph.label_propagation(
        _formula_edges(spark, sf_dir), iterations=4
    )
    return labels.select(F.col("node").alias("host"), "community")


def _kcore_oracle(k: int, iters: int) -> str:
    """Unrolled simultaneous-peeling replay (DuckDB): per round a degree
    count over the current edge set, a >= k keep filter, and a
    double-ended restriction of the edges to survivors (keep sets are
    unique on node, so inner joins are semi-joins).  Pure integer
    arithmetic — hash-exact with no rounding.  Edge CTEs are ``AS
    MATERIALIZED`` (each es{i} is referenced three times in round
    i+1)."""
    parts = [
        f"""WITH e0 AS (
      SELECT DISTINCT (doc_id % {_N_HOSTS}) AS src,
             ((doc_id % {_N_HOSTS}) * 7 + kk.k) % {_N_HOSTS} AS dst
      FROM documents CROSS JOIN (VALUES (1), (2), (3)) AS kk(k)
      WHERE (doc_id % {_N_HOSTS}) % 10 <> 0
        AND (doc_id % {_N_HOSTS}) <> ((doc_id % {_N_HOSTS}) * 7 + kk.k) % {_N_HOSTS}
    ),
    es0 AS MATERIALIZED (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst AS a, src AS b FROM e0
      ) u WHERE a <> b
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""deg{i} AS (
      SELECT a, COUNT(*) AS c FROM es{i - 1} GROUP BY a
    ),
    keep{i} AS MATERIALIZED (SELECT a FROM deg{i} WHERE c >= {k}),
    es{i} AS MATERIALIZED (
      SELECT e.a, e.b
      FROM es{i - 1} e
      JOIN keep{i} ka ON ka.a = e.a
      JOIN keep{i} kb ON kb.a = e.b
    )"""
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT a AS host, CAST(COUNT(*) AS BIGINT) AS degree
    FROM es{iters} GROUP BY a"""
    )


@register(
    "pipe_web_kcore",
    oracle=_kcore_oracle(4, 3),
    doc="k-core graph pruning (webgraph.k_core), the cleanup step "
    "BEFORE the centrality/grouping signals: link farms and orphan "
    "hosts fall out of the k-core, so pagerank/LPA run on an embedded "
    "subgraph.  Simultaneous peeling — drop ALL sub-k nodes per round, "
    "restrict edges to survivors — is order-independent (the k-core is "
    "unique; no tie-breaks exist to get wrong), so 3 fixed rounds at "
    "k=4 on the 60-host formula graph replay as pure integer SQL and "
    "the face is hash-exact with no rounding.  Per round: one "
    "map-side-combinable degree count + two semi-joins, no windows",
)
def pipe_web_kcore(spark, sf_dir):
    nodes = webgraph.k_core(_formula_edges(spark, sf_dir), k=4, iterations=3)
    return nodes.select(F.col("node").alias("host"), "degree")


_TRIANGLES_ORACLE = f"""
    WITH e0 AS (
      SELECT DISTINCT (doc_id % {_N_HOSTS}) AS src,
             ((doc_id % {_N_HOSTS}) * 7 + kk.k) % {_N_HOSTS} AS dst
      FROM documents CROSS JOIN (VALUES (1), (2), (3)) AS kk(k)
      WHERE (doc_id % {_N_HOSTS}) % 10 <> 0
        AND (doc_id % {_N_HOSTS}) <> ((doc_id % {_N_HOSTS}) * 7 + kk.k) % {_N_HOSTS}
    ),
    es AS MATERIALIZED (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst AS a, src AS b FROM e0
      ) u WHERE a <> b
    ),
    deg AS (SELECT a, COUNT(*) AS deg FROM es GROUP BY a),
    -- each triangle x<y<z found exactly once: path x->y->z + chord x->z
    tri AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM es e1
      JOIN es e2 ON e2.a = e1.b AND e2.b > e1.b
      JOIN es e3 ON e3.a = e1.a AND e3.b = e2.b
      WHERE e1.b > e1.a
    ),
    per_node AS (
      SELECT node, COUNT(*) AS t FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) u GROUP BY node
    )
    SELECT d.a AS host,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(p.t, 0) AS BIGINT) AS triangles,
           CASE WHEN d.deg < 2 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(COALESCE(p.t, 0) * 2 AS DOUBLE)
                     / CAST(d.deg * (d.deg - 1) AS DOUBLE)
           END AS clustering
    FROM deg d LEFT JOIN per_node p ON p.node = d.a"""


@register(
    "pipe_web_triangles",
    oracle=_TRIANGLES_ORACLE,
    doc="exact triangle counts + local clustering coefficients "
    "(webgraph.triangle_stats), the link-farm discriminator beside "
    "k-core: farms keep DEGREE but close almost no triangles, while "
    "organically embedded hosts show high local clustering.  The "
    "operator uses degree-ordered edge orientation (out-degree bounded "
    "by O(sqrt(2m)) however skewed the graph), so the wedge self-join "
    "is O(m^1.5) worst-case and hub nodes never pair their full "
    "neighbor lists; each triangle is found once, at its lowest-order "
    "vertex, and closure is a leftsemi equi-join.  The oracle counts "
    "the same triangles canonically (x<y<z path + chord).  Counts are "
    "pure integers; clustering is ONE IEEE double division of exact "
    "integers — hash-exact with no rounding",
)
def pipe_web_triangles(spark, sf_dir):
    stats = webgraph.triangle_stats(_formula_edges(spark, sf_dir))
    return stats.select(
        F.col("node").alias("host"), "degree", "triangles", "clustering"
    )
