"""URL normalization / registrable-domain edge cases (functions/url.py)
plus the registry-hygiene gate (VERDICT r4 item 8): every query module
under queries/ must be reachable from all_queries()/all_oracles()."""

import pathlib

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions import url as U


def _norm(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(U.normalize_url("url", **kw).alias("c")).collect()
    return [r["c"] for r in rows]


def test_case_port_fragment_tracking_collapse(spark):
    # All spellings of one page -> one canonical form.
    variants = [
        "https://example.com/doc/1?a=1&b=2",
        "HTTPS://Example.COM:443/doc/1?b=2&a=1#frag",
        "https://www.example.com/doc/1?a=1&utm_source=x&b=2&fbclid=z",
        "https://EXAMPLE.com:443/doc/1?UTM_Campaign=spring&a=1&b=2",
        "https://example.com/doc/1?FBCLID=deadbeef&GCLID=c&b=2&a=1",
    ]
    out = _norm(spark, variants)
    assert set(out) == {"https://example.com/doc/1?a=1&b=2"}


def test_default_port_only_for_matching_scheme(spark):
    out = _norm(
        spark,
        [
            "http://h.com:80/",   # default for http -> stripped
            "http://h.com:443/",  # NOT default for http -> kept
            "https://h.com:8443/x",
        ],
    )
    assert out == [
        "http://h.com/",
        "http://h.com:443/",
        "https://h.com:8443/x",
    ]


def test_empty_path_and_query_edge_cases(spark):
    out = _norm(
        spark,
        [
            "http://h.com",                 # no path -> '/'
            "http://h.com?utm_source=a",    # only tracking params -> no '?'
            "http://h.com/p?",              # empty query -> no '?'
            "http://h.com/p?&&a=1&",        # empty tokens dropped
        ],
    )
    assert out == [
        "http://h.com/",
        "http://h.com/",
        "http://h.com/p",
        "http://h.com/p?a=1",
    ]


def test_non_url_strings_quarantine_to_null(spark):
    out = _norm(spark, ["not a url", "", "ftp.example.com/path", "://x"])
    assert out == [None, None, None, None]


def test_keep_www_option(spark):
    out = _norm(spark, ["http://www.h.com/a"], strip_www=False)
    assert out == ["http://www.h.com/a"]


def test_registrable_domain_suffixes(spark):
    cases = {
        "example.com": "example.com",
        "a.b.example.com": "example.com",
        "example.co.uk": "example.co.uk",
        "deep.sub.example.co.uk": "example.co.uk",
        "example.ac.jp": "example.ac.jp",
        # 'co' under a long TLD is NOT a public-suffix pattern here
        "x.co.company": "co.company",
        "localhost": "localhost",
        "co.uk": "co.uk",  # bare suffix passes through (<=2 labels)
    }
    df = spark.createDataFrame([(h,) for h in cases], ["h"])
    rows = df.select("h", U.registrable_domain("h").alias("d")).collect()
    got = {r["h"]: r["d"] for r in rows}
    assert got == cases


def test_component_extractors(spark):
    df = spark.createDataFrame(
        [("HtTpS://User.Host.COM:9443/A/B?x=1&y=2#z",)], ["url"]
    )
    row = df.select(
        U.url_scheme("url").alias("s"),
        U.url_host("url").alias("h"),
        U.url_port("url").alias("p"),
        U.url_path("url").alias("pa"),
        U.url_query("url").alias("q"),
    ).collect()[0]
    assert (row["s"], row["h"], row["p"], row["pa"], row["q"]) == (
        "https",
        "user.host.com",
        "9443",
        "/A/B",
        "x=1&y=2",
    )


def test_registry_hygiene_every_query_module_is_wired():
    """VERDICT r4 item 8: a queries/*.py module that defines a non-empty
    QUERIES dict but is not merged into all_queries() is dead code — the
    exact failure mode corpus_ops shipped with in round 4. Red on any
    unregistered module; green now."""
    import importlib

    from cdc_application_febuary_spark import queries as qpkg

    registered = set(qpkg.all_queries())
    oracles = qpkg.all_oracles()
    pkg_dir = pathlib.Path(qpkg.__file__).parent
    for mod_file in sorted(pkg_dir.glob("*.py")):
        if mod_file.name == "__init__.py":
            continue
        mod = importlib.import_module(
            f"cdc_application_febuary_spark.queries.{mod_file.stem}"
        )
        mod_queries = getattr(mod, "QUERIES", {})
        missing = set(mod_queries) - registered
        assert not missing, (
            f"queries/{mod_file.name} defines queries not reachable from "
            f"all_queries(): {sorted(missing)} — add the module to "
            "all_queries()/all_oracles() in queries/__init__.py"
        )
        mod_oracles = getattr(mod, "ORACLES", {})
        missing_o = set(mod_oracles) - set(oracles)
        assert not missing_o, (
            f"queries/{mod_file.name} oracles unreachable from "
            f"all_oracles(): {sorted(missing_o)}"
        )


def test_url_domain_dedup_collapses_exactly(spark, sf_dir):
    from cdc_application_febuary_spark.queries import all_queries

    df = all_queries()["url_domain_dedup"](spark, sf_dir)
    agg = df.select(
        F.sum("raw_urls").alias("raw"),
        F.sum("canonical_urls").alias("canon"),
    ).collect()[0]
    # 500 raw spellings -> exactly 250 canonical URLs (2 per page).
    assert agg["raw"] == 500
    assert agg["canon"] == 250
    # every domain is either site<k>.com or site<k>.co.uk
    doms = [r["domain"] for r in df.collect()]
    assert all(
        d.startswith("site") and (d.endswith(".com") or d.endswith(".co.uk"))
        for d in doms
    )
