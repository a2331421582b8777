"""URL canonicalization and host-level rollups — the Common-Crawl
front door.

A crawl corpus keys everything by URL, and raw crawl URLs are noisy:
mixed-case scheme/host, default ports, tracking query parameters,
unsorted parameters, fragments, ``www.`` aliases.  Canonicalization
is what makes url-exact dedup and host-level statistics meaningful
(the reference keys its extraction goldens by url the same way —
SURVEY §1.2).

The synthetic documents table has no url column, so both engines
derive the same messy URL deterministically from ``doc_id`` (same
pattern as the PII injection: a redactor verified only on zero-match
inputs proves nothing), then canonicalize it with the SAME string
pipeline.

Everything is codegen string ops — one map-side pass, no shuffle for
``url_canonicalize``; ``host_stats`` adds the one groupBy a rollup
needs.  Regexes avoid backslashes entirely (``[.]`` for a literal
dot) so the same pattern string survives Spark SQL literal parsing,
Java regex, and RE2 identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import load

#: messy-URL synthesis (shared shape, engine-specific cast spelling)
_RAW = (
    "'HTTPS://WWW.Host' || CAST(doc_id % 50 AS {s})"
    " || '.Example' || CAST(doc_id % 7 AS {s})"
    " || '.COM:443/p' || CAST(doc_id % 17 AS {s})"
    " || '/page/?id=' || CAST(doc_id AS {s})"
    " || '&utm_source=s' || CAST(doc_id % 5 AS {s})"
    " || '&b=2&a=1&utm_medium=m#sec' || CAST(doc_id % 9 AS {s})"
)
_RAW_SPARK = _RAW.format(s="STRING")
_RAW_DUCK = _RAW.format(s="VARCHAR")

# canonicalization fragments (identical function names in both
# engines except filter/list_filter and array_join/array_to_string,
# spelled per-engine below)
_SCHEME = "lower(regexp_extract(raw, '^[A-Za-z]+', 0))"
_HOSTPORT = "lower(regexp_extract(raw, '^[A-Za-z]+://([^/]+)', 1))"
_HOST = (
    "regexp_replace(regexp_replace(" + _HOSTPORT + ","
    " ':443$', ''), '^www[.]', '')"
)
_PATH = "regexp_extract(raw, '^[A-Za-z]+://[^/]+([^?#]*)', 1)"
_QUERY = "regexp_extract(raw, '[?]([^#]*)', 1)"


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents", parallelize=True)
    q = docs.selectExpr("doc_id", f"{_RAW_SPARK} AS raw").selectExpr(
        "doc_id",
        f"{_SCHEME} AS scheme",
        f"{_HOST} AS host",
        f"{_PATH} AS path",
        f"split({_QUERY}, '&') AS params",
    )
    kept = "filter(params, p -> left(p, 4) <> 'utm_')"
    return q.selectExpr(
        "doc_id",
        "scheme || '://' || host || path ||"
        f" CASE WHEN size({kept}) > 0"
        f" THEN '?' || array_join(array_sort({kept}), '&')"
        " ELSE '' END AS url_canon",
        "host",
        "regexp_extract(host, '([a-z0-9-]+[.][a-z]+)$', 1) AS domain",
        "CAST(size(filter(split(path, '/'), s -> s <> '')) AS INT)"
        " AS path_depth",
        f"CAST(size(params) - size({kept}) AS BIGINT)"
        " AS n_tracking_removed",
    )


URL_CANON_SQL = f"""
WITH r AS (
  SELECT doc_id, {_RAW_DUCK} AS raw FROM documents
), q AS (
  SELECT doc_id,
         {_SCHEME} AS scheme,
         {_HOST} AS host,
         {_PATH} AS path,
         string_split({_QUERY}, '&') AS params
  FROM r
)
SELECT doc_id,
       scheme || '://' || host || path ||
         CASE WHEN len(list_filter(params, p -> left(p, 4) <> 'utm_')) > 0
              THEN '?' || array_to_string(
                     list_sort(list_filter(params,
                                           p -> left(p, 4) <> 'utm_')), '&')
              ELSE '' END AS url_canon,
       host,
       regexp_extract(host, '([a-z0-9-]+[.][a-z]+)$', 1) AS domain,
       CAST(len(list_filter(string_split(path, '/'), s -> s <> ''))
            AS INTEGER) AS path_depth,
       CAST(len(params)
            - len(list_filter(params, p -> left(p, 4) <> 'utm_'))
            AS BIGINT) AS n_tracking_removed
FROM q
"""


def host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain rollup over canonical hosts: the table a
    crawl scheduler / quality dashboard reads.  One groupBy on a
    low-cardinality key; distinct-host counting is the standard
    partial-aggregatable count(distinct)."""
    canon = url_canonicalize(spark, sf_dir)
    return canon.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("host").cast("bigint").alias("n_hosts"),
        F.sum("path_depth").cast("bigint").alias("sum_path_depth"),
        F.sum("n_tracking_removed").cast("bigint").alias("n_tracking"),
    )


HOST_STATS_SQL = f"""
WITH canon AS ({URL_CANON_SQL})
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(sum(path_depth) AS BIGINT) AS sum_path_depth,
       CAST(sum(n_tracking_removed) AS BIGINT) AS n_tracking
FROM canon
GROUP BY domain
"""


#: recrawl synthesis: RECRAWL_MOD doc_ids alias to one canonical url
#: (distinct capture timestamps derived from doc_id), so keep-latest
#: has real work to do
RECRAWL_MOD = 100


def url_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style crawl dedup: many captures of one canonical URL,
    keep the LATEST capture (ties impossible: capture ts is strictly
    increasing in doc_id within a url group).

    The crawl-scale shape: one shuffle on the canonical url,
    row_number window ordered (ts desc, doc_id desc) — group size is
    the recrawl count per url (bounded in practice by crawl policy),
    never corpus-sized.  Emits per-kept-capture recrawl stats a crawl
    scheduler reads (n_captures, span between first and last)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents", parallelize=True)
    caps = docs.select(
        "doc_id",
        F.expr(f"'https://ex.com/item/' || CAST(doc_id % {RECRAWL_MOD}"
               " AS STRING)").alias("url"),
        # capture time: epoch day derived from doc_id, deterministic
        F.expr("CAST(doc_id AS BIGINT)").alias("capture_day"),
    )
    w = Window.partitionBy("url").orderBy(
        F.col("capture_day").desc(), F.col("doc_id").desc()
    )
    return (
        caps.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_captures",
            F.count("*").over(Window.partitionBy("url")).cast("bigint"),
        )
        .withColumn(
            "span_days",
            (F.max("capture_day").over(Window.partitionBy("url"))
             - F.min("capture_day").over(Window.partitionBy("url")))
            .cast("bigint"),
        )
        .filter(F.col("rn") == 1)
        .select("url", F.col("doc_id").alias("kept_doc_id"),
                "n_captures", "span_days")
    )


URL_DEDUP_SQL = f"""
WITH caps AS (
  SELECT doc_id,
         'https://ex.com/item/' || CAST(doc_id % {RECRAWL_MOD} AS VARCHAR)
           AS url,
         CAST(doc_id AS BIGINT) AS capture_day
  FROM documents
), ranked AS (
  SELECT url, doc_id, capture_day,
         row_number() OVER (PARTITION BY url
                            ORDER BY capture_day DESC, doc_id DESC) AS rn,
         CAST(count(*) OVER (PARTITION BY url) AS BIGINT) AS n_captures,
         CAST(max(capture_day) OVER (PARTITION BY url)
              - min(capture_day) OVER (PARTITION BY url) AS BIGINT)
           AS span_days
  FROM caps
)
SELECT url, doc_id AS kept_doc_id, n_captures, span_days
FROM ranked WHERE rn = 1
"""


#: deterministic robots synthesis: 13 hosts; per host a disallow
#: prefix on one leading digit, a LONGER allow override, a
#: never-matching rule, and (every 4th host) a same-length allow
#: duplicate of the disallow — the spec's "tie -> allow wins" case.
_N_ROBOTS_HOSTS = 13


def robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl politeness: evaluate robots.txt rules against every URL
    with the public robots spec semantics (longest-prefix match wins;
    equal length -> allow wins; no match -> allowed).

    Scale shape: rule tables are per-host and tiny (a robots.txt is
    KBs), so the rules are pre-grouped into one array per host and
    BROADCAST; each page then resolves its verdict in a per-row fold
    over its host's rules — one broadcast hash join + a map pass, no
    corpus shuffle and no corpus-wide window.  (The naive plan —
    explode candidates + row_number over url — shuffles the corpus
    twice; the fold is the 10^12-doc plan.)"""
    docs = load(spark, sf_dir, "documents", parallelize=True)
    pages = docs.selectExpr(
        "doc_id",
        f"'https://crawl' || CAST(doc_id % {_N_ROBOTS_HOSTS} AS STRING)"
        " || '.example/p/' || CAST(doc_id AS STRING) AS url",
        f"'crawl' || CAST(doc_id % {_N_ROBOTS_HOSTS} AS STRING)"
        " || '.example' AS host",
        "'/p/' || CAST(doc_id AS STRING) AS path",
    )
    rules = spark.range(_N_ROBOTS_HOSTS).selectExpr(
        "CAST(id AS INT) AS k"
    ).selectExpr(
        "'crawl' || CAST(k AS STRING) || '.example' AS host",
        "concat("
        " array("
        "  named_struct('prefix', '/p/' || CAST((k*3)%10 AS STRING),"
        "               'allow', false),"
        "  named_struct('prefix', '/p/' || CAST((k*3)%10 AS STRING)"
        "                || CAST((k+1)%10 AS STRING), 'allow', true),"
        "  named_struct('prefix', '/q', 'allow', false)),"
        " CASE WHEN k % 4 = 0 THEN"
        "  array(named_struct('prefix', '/p/' || CAST((k*3)%10 AS STRING),"
        "                     'allow', true))"
        " ELSE array() END) AS rules",
    )
    joined = pages.join(F.broadcast(rules), "host", "left")
    best = (
        "aggregate("
        " filter(rules, r -> startswith(path, r.prefix)),"
        " CAST(NULL AS STRUCT<prefix: STRING, allow: BOOLEAN>),"
        " (acc, r) -> CASE"
        "  WHEN acc IS NULL THEN r"
        "  WHEN length(r.prefix) > length(acc.prefix) THEN r"
        "  WHEN length(r.prefix) = length(acc.prefix)"
        "   AND r.allow AND NOT acc.allow THEN r"
        "  ELSE acc END)"
    )
    return joined.selectExpr("url", f"{best} AS best").selectExpr(
        "url",
        "coalesce(best.prefix, '') AS matched_prefix",
        "coalesce(best.allow, true) AS allowed",
    )


ROBOTS_SQL = f"""
WITH ks AS (SELECT unnest(generate_series(0, {_N_ROBOTS_HOSTS - 1})) AS k),
rules AS (
  SELECT 'crawl' || CAST(k AS VARCHAR) || '.example' AS host,
         '/p/' || CAST((k*3)%10 AS VARCHAR) AS prefix, false AS allow
  FROM ks
  UNION ALL
  SELECT 'crawl' || CAST(k AS VARCHAR) || '.example',
         '/p/' || CAST((k*3)%10 AS VARCHAR) || CAST((k+1)%10 AS VARCHAR),
         true
  FROM ks
  UNION ALL
  SELECT 'crawl' || CAST(k AS VARCHAR) || '.example', '/q', false FROM ks
  UNION ALL
  SELECT 'crawl' || CAST(k AS VARCHAR) || '.example',
         '/p/' || CAST((k*3)%10 AS VARCHAR), true
  FROM ks WHERE k % 4 = 0
),
pages AS (
  SELECT doc_id,
         'https://crawl' || CAST(doc_id % {_N_ROBOTS_HOSTS} AS VARCHAR)
           || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
         'crawl' || CAST(doc_id % {_N_ROBOTS_HOSTS} AS VARCHAR)
           || '.example' AS host,
         '/p/' || CAST(doc_id AS VARCHAR) AS path
  FROM documents
),
cand AS (
  SELECT p.doc_id, p.url, r.prefix, r.allow
  FROM pages p
  LEFT JOIN rules r
    ON p.host = r.host AND starts_with(p.path, r.prefix)
),
best AS (
  SELECT doc_id, url, prefix, allow,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY length(prefix) DESC,
                                     allow DESC, prefix) AS rn
  FROM cand
)
SELECT url,
       coalesce(prefix, '') AS matched_prefix,
       coalesce(allow, true) AS allowed
FROM best WHERE rn = 1
"""


#: redirect-chain synthesis: doc_ids form chain groups of _RC_GROUP
#: (position 0 is the terminal landing page; position k redirects to
#: position k-1), so chain length spans 1.._RC_GROUP-1 hops and the
#: doubling loop needs ceil(log2(7)) = 3 rounds — exercised, not
#: degenerate
_RC_GROUP = 8
_RC_URL = "'https://r.example/u/' || CAST({id} AS {s})"


def _redirects_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents", parallelize=True)
    u = _RC_URL.format(id="doc_id", s="STRING")
    v = _RC_URL.format(id="doc_id - 1", s="STRING")
    return docs.filter(f"doc_id % {_RC_GROUP} != 0").selectExpr(
        f"{u} AS src", f"{v} AS dst"
    )


def redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve multi-hop redirect chains to their final landing page —
    the crawl-frontier step that collapses 301/302/canonical-link maps
    before url-keyed dedup (a crawl sees the same page under every
    intermediate hop; training-data curation wants one key per
    destination).

    Scale shape: POINTER DOUBLING, the same O(log chain-length) round
    structure as connected components — each round left-joins the map
    with itself on (dst = src), squaring every chain's resolved span,
    so a 10^12-row redirect map with 30-hop chains resolves in 5
    shuffles instead of 30 sequential self-joins (a recursive CTE's
    shape).  Per round: one equi-join on the url key + one slim count
    action for convergence; ``localCheckpoint`` truncates the plan so
    lineage doesn't stack across rounds (same discipline as
    dedup_components).  Cycles cannot arise from the synthesized
    chains; production input would pre-break them with the components
    op (documented, not silently assumed: the loop is round-capped).

    Output: (url, final_url, n_hops) for every redirecting url."""
    m = _redirects_spark(spark, sf_dir)
    resolved, _ = resolve_redirects(m)
    return resolved


def resolve_redirects(redirects: DataFrame,
                      max_rounds: int = 6) -> tuple[DataFrame, int]:
    """Pointer-double a (src, dst) redirect map until no dst is itself
    a src; returns (resolved map (url, final_url, n_hops), rounds
    used).  max_rounds=6 resolves chains up to 2^6 = 64 hops; longer
    chains come back partially resolved (their dst is still a src) —
    callers wanting a hard guarantee assert the returned round count
    is < max_rounds."""
    m = redirects.selectExpr(
        "src", "dst", "CAST(1 AS BIGINT) AS hops"
    ).localCheckpoint()
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        nxt = m.alias("a").join(
            m.alias("b"), F.col("a.dst") == F.col("b.src"), "left"
        ).select(
            F.col("a.src").alias("src"),
            F.coalesce(F.col("b.dst"), F.col("a.dst")).alias("dst"),
            (F.col("a.hops")
             + F.coalesce(F.col("b.hops"), F.lit(0))).alias("hops"),
        ).localCheckpoint()
        still = nxt.alias("a").join(
            nxt.select("src").alias("b"),
            F.col("a.dst") == F.col("b.src"), "left_semi",
        ).count()
        m = nxt
        if still == 0:
            break
    return (m.selectExpr("src AS url", "dst AS final_url",
                         "hops AS n_hops"), rounds)


_RC_U_DUCK = _RC_URL.format(id="doc_id", s="VARCHAR")
_RC_V_DUCK = _RC_URL.format(id="doc_id - 1", s="VARCHAR")

REDIRECT_CHAINS_SQL = f"""
WITH RECURSIVE redirects AS (
  SELECT {_RC_U_DUCK} AS src, {_RC_V_DUCK} AS dst
  FROM documents WHERE doc_id % {_RC_GROUP} != 0
),
walk(src, dst, hops) AS (
  SELECT src, dst, CAST(1 AS BIGINT) FROM redirects
  UNION ALL
  SELECT w.src, r.dst, w.hops + 1
  FROM walk w JOIN redirects r ON w.dst = r.src
)
SELECT w.src AS url, w.dst AS final_url, w.hops AS n_hops
FROM walk w
WHERE NOT EXISTS (SELECT 1 FROM redirects r WHERE r.src = w.dst)
"""


#: frontier politeness parameters (DEPTH=8 so the synthesized corpus
#: — ~13.5 candidates/host — actually exercises the drop path)
FRONTIER_DEPTH = 8      #: fetches per host per crawl cycle
FRONTIER_CRAWLERS = 8   #: politeness shards (all of a host on one)
_FR_HOSTS = 37
_FR_HOST = "'h' || CAST(doc_id % {m} AS {s}) || '.example'".replace(
    "{m}", str(_FR_HOSTS)
)
_FR_URL = "'https://' || host || '/f/' || CAST(doc_id AS {s})"


def frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier scheduling under politeness: every candidate URL
    gets (crawler, fetch_round) such that each host is fetched by ONE
    crawler (politeness delays are enforceable only if a host never
    spans workers) one URL per round in priority order, and each
    host's queue is capped at FRONTIER_DEPTH per cycle (at 1 req/s/
    host politeness a cycle physically can't drain more — deep queues
    are dead weight, so capping is semantics, not approximation).

    Scale shape: the naive plan is one window over host — and the
    pathological host with 10^9 candidates would sort them all in one
    task.  Instead an EXACT two-phase top-K: phase 1 windows over
    (host, input-partition-id) — a skew-free key by construction —
    and keeps each partition's local top-DEPTH; phase 2 windows over
    host on the survivors, at most DEPTH x n_partitions rows per host
    (the global top-DEPTH is a subset of the union of local
    top-DEPTHs).  Same decomposition as the salted agg, applied to a
    ranking.  Crawler assignment is the bloom-family md5 fold —
    cross-engine exact, so the oracle replays it."""
    from pyspark.sql import Window

    from .bloom import hash_expr

    docs = load(spark, sf_dir, "documents", parallelize=True)
    cand = docs.selectExpr(
        _FR_HOST.format(s="STRING") + " AS host", "doc_id"
    ).selectExpr(
        "host",
        _FR_URL.format(s="STRING") + " AS url",
    ).selectExpr(
        "host", "url",
        f"{hash_expr('url', 0, 1000)} AS priority",
        f"{hash_expr('host', 1, FRONTIER_CRAWLERS)} AS crawler",
    )
    w1 = (
        Window.partitionBy("host", F.spark_partition_id())
        .orderBy(F.desc("priority"), F.asc("url"))
    )
    local = cand.withColumn("lrn", F.row_number().over(w1)).filter(
        F.col("lrn") <= FRONTIER_DEPTH
    ).drop("lrn")
    w2 = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("url")
    )
    return (
        local.withColumn("fetch_round",
                         F.row_number().over(w2).cast("bigint"))
        .filter(F.col("fetch_round") <= FRONTIER_DEPTH)
        .select("url", "host", "crawler", "priority", "fetch_round")
    )


_FR_HOST_DUCK = _FR_HOST.format(s="VARCHAR")
_FR_URL_DUCK = _FR_URL.format(s="VARCHAR")

FRONTIER_SQL = f"""
WITH cand AS (
  SELECT host, {_FR_URL_DUCK} AS url FROM (
    SELECT {_FR_HOST_DUCK} AS host, doc_id FROM documents
  )
),
scored AS (
  SELECT url, host,
         {{crawler}} AS crawler,
         {{priority}} AS priority
  FROM cand
),
ranked AS (
  SELECT url, host, crawler, priority,
         CAST(row_number() OVER (PARTITION BY host
                                 ORDER BY priority DESC, url) AS BIGINT)
           AS fetch_round
  FROM scored
)
SELECT url, host, crawler, priority, fetch_round
FROM ranked WHERE fetch_round <= {FRONTIER_DEPTH}
"""


def _frontier_sql() -> str:
    from .bloom import hash_expr

    return FRONTIER_SQL.format(
        crawler=hash_expr("host", 1, FRONTIER_CRAWLERS),
        priority=hash_expr("url", 0, 1000),
    )


QUERIES = {
    "url_canonicalize": url_canonicalize,
    "host_stats": host_stats,
    "url_dedup_latest": url_dedup_latest,
    "robots_filter": robots_filter,
    "redirect_chains": redirect_chains,
    "frontier_schedule": frontier_schedule,
}
ORACLES = {
    "url_canonicalize": URL_CANON_SQL,
    "host_stats": HOST_STATS_SQL,
    "url_dedup_latest": URL_DEDUP_SQL,
    "robots_filter": ROBOTS_SQL,
    "redirect_chains": REDIRECT_CHAINS_SQL,
    "frontier_schedule": _frontier_sql(),
}
