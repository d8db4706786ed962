"""Web-corpus extension queries: URL canonicalization + registrable-domain
rollup (``functions/url.py``).

Same contract as ``pipeline_ops``: each query is a thin adapter over a
library operator, paired with a DuckDB oracle whenever the semantics are
SQL-expressible. Hash-compared float columns follow CLAUDE.md's rules —
integer/decimal arithmetic, or bit-identical IEEE chains (div/mul/sqrt/
floor/max are correctly rounded and identical across engines; libm logs go
through the DECIMAL(18,6)-rounded-contribution pattern like BM25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# ---------------------------------------------------------------------------
# URL canonicalization + registrable-domain rollup
# ---------------------------------------------------------------------------
# Deterministic synthetic URLs: docs k and k+250 render the SAME page with
# different spellings (case, www, explicit default port, tracking params,
# param order, fragment), so normalize_url must collapse 500 raw URLs to
# exactly 250 canonical ones. The construction is plain integer CASE logic,
# identical in both engines; the NORMALIZATION is what's under test.
_URL_BUILD_SQL = """
  SELECT doc_id,
         doc_id % 250 AS k,
         CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END AS alt,
         (CASE WHEN doc_id % 250 % 2 = 0
               THEN CASE WHEN doc_id >= 250 THEN 'HTTPS' ELSE 'https' END
               ELSE CASE WHEN doc_id >= 250 THEN 'Http' ELSE 'http' END END)
         || '://'
         || (CASE WHEN doc_id >= 250 THEN 'WWW.Site' ELSE 'site' END)
         || CAST(doc_id % 250 % 20 AS VARCHAR)
         || (CASE WHEN doc_id % 250 % 4 = 0
                  THEN CASE WHEN doc_id >= 250 THEN '.Co.UK' ELSE '.co.uk' END
                  ELSE CASE WHEN doc_id >= 250 THEN '.CoM' ELSE '.com' END END)
         || (CASE WHEN doc_id >= 250
                  THEN CASE WHEN doc_id % 250 % 2 = 0 THEN ':443' ELSE ':80' END
                  ELSE '' END)
         || '/doc/' || CAST(doc_id % 250 AS VARCHAR)
         || (CASE WHEN doc_id % 250 % 5 = 0 THEN ''
                  WHEN doc_id >= 250 THEN '?b=2&UTM_Source=x&a=1&FBclid=z'
                  ELSE '?a=1&b=2' END)
         || (CASE WHEN doc_id >= 250 THEN '#frag' ELSE '' END) AS url
  FROM documents
"""

_URL_ORACLE = f"""
WITH raw AS MATERIALIZED ({_URL_BUILD_SQL}),
parsed AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/:?#]*)', 1)) AS rawhost,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*?:([0-9]+)', 1) AS port,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM raw
),
kept AS (
  -- array_to_string over an empty DuckDB list is NULL, not '' — coalesce,
  -- or every no-surviving-params URL turns into a NULL canonical.
  SELECT *,
         COALESCE(array_to_string(list_sort(list_filter(
             string_split(q, '&'),
             p -> p <> '' AND NOT regexp_matches(p,
               '(?i)^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)='))), '&'),
           '') AS keptq
  FROM parsed
),
norm AS (
  SELECT doc_id,
         regexp_replace(rawhost, '^www\\.', '') AS host,
         scheme || '://' || regexp_replace(rawhost, '^www\\.', '')
         || (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443')
                  THEN '' ELSE ':' || port END)
         || (CASE WHEN path = '' THEN '/' ELSE path END)
         || (CASE WHEN keptq = '' THEN '' ELSE '?' || keptq END) AS canonical
  FROM kept
),
dom AS (
  SELECT doc_id, canonical,
         CASE WHEN len(string_split(host, '.')) <= 2 THEN host
              WHEN list_contains(['co','com','net','org','ac','gov','edu'],
                                 string_split(host, '.')[-2])
                   AND len(string_split(host, '.')[-1]) = 2
              THEN array_to_string(string_split(host, '.')[-3:], '.')
              ELSE array_to_string(string_split(host, '.')[-2:], '.') END AS domain
  FROM norm
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS raw_urls,
       CAST(COUNT(DISTINCT canonical) AS BIGINT) AS canonical_urls,
       MIN(canonical) AS sample_url
FROM dom GROUP BY 1 ORDER BY domain
"""


@_q("url_domain_dedup", _URL_ORACLE)
def url_domain_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registrable-domain rollup
    (`functions/url.py`): 500 raw spellings must collapse to 250 canonical
    URLs, rolled up per eTLD+1 domain. Exercises case folding, www/default-
    port/fragment stripping, tracking-param removal, and param sorting —
    all pure column expressions (no UDFs). The oracle re-implements the
    same grammar in DuckDB list/regexp functions."""
    from ..functions import url as U

    docs = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id") % 250
    alt = F.col("doc_id") >= 250
    scheme = F.when(
        k % 2 == 0, F.when(alt, "HTTPS").otherwise("https")
    ).otherwise(F.when(alt, "Http").otherwise("http"))
    host = F.concat(
        F.when(alt, "WWW.Site").otherwise("site"),
        (k % 20).cast("string"),
        F.when(
            k % 4 == 0, F.when(alt, ".Co.UK").otherwise(".co.uk")
        ).otherwise(F.when(alt, ".CoM").otherwise(".com")),
    )
    port = F.when(
        alt, F.when(k % 2 == 0, ":443").otherwise(":80")
    ).otherwise("")
    query = F.when(k % 5 == 0, "").otherwise(
        F.when(alt, "?b=2&UTM_Source=x&a=1&FBclid=z").otherwise("?a=1&b=2")
    )
    frag = F.when(alt, "#frag").otherwise("")
    raw = docs.select(
        "doc_id",
        F.concat(
            scheme, F.lit("://"), host, port,
            F.lit("/doc/"), k.cast("string"), query, frag,
        ).alias("url"),
    )
    canon = raw.select(
        "doc_id",
        U.normalize_url("url").alias("canonical"),
        U.registrable_domain(
            F.regexp_replace(U.url_host("url"), r"^www\.", "")
        ).alias("domain"),
    )
    return (
        canon.groupBy("domain")
        .agg(
            F.count("*").alias("raw_urls"),
            F.countDistinct("canonical").alias("canonical_urls"),
            F.min("canonical").alias("sample_url"),
        )
        .orderBy("domain")
    )
