"""URL normalization and domain extraction for web-corpus pipelines.

Web-scale training corpora carry one URL per document; the standard prep
steps are (1) canonicalize the URL so trivially-different spellings of the
same page dedup together (case, default ports, tracking parameters, param
order, fragments), and (2) roll quality statistics up to the registrable
domain so low-quality domains can be filtered as units (the reference's
profiling tier works per-table; this is its per-domain analog for document
corpora — see `/root/reference/backend/ingestion/data_quality.py` for the
profiling shape being mirrored).

Everything here is pure column expressions (regexp + array built-ins), so
the whole pipeline stays inside whole-stage codegen — no UDFs. The grammar
is the common subset `scheme://host[:port][/path][?query][#fragment]` with
no userinfo; URLs outside it yield NULL components rather than erroring
(per-row quarantine, like the multimodal decoders).

Scale posture: per-row string work, embarrassingly parallel; the domain
rollup is one hash aggregation on a low-cardinality key.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Query parameters that never identify content — the usual tracking set.
# Case-insensitive: trackers appear in the wild as UTM_Source / FBCLID too,
# and a case-sensitive filter would leave two spellings of one page unmerged.
TRACKING_PARAM_RE = r"(?i)^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="

# Second-level labels that act as public suffixes under a 2-letter ccTLD
# (public-suffix-lite: the full PSL is a data file; this heuristic covers
# the common `example.co.uk` family and is documented as such).
_SECOND_LEVEL_SUFFIXES = ("co", "com", "net", "org", "ac", "gov", "edu")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: Column | str) -> Column:
    """Lower-cased scheme, or NULL when the value isn't scheme://-shaped."""
    s = F.regexp_extract(_c(url), r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    return F.when(s != "", F.lower(s))


def _authority(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)


def url_host(url: Column | str) -> Column:
    """Lower-cased host without the port; NULL for non-URL strings."""
    h = F.regexp_extract(_authority(url), r"^([^:]*)", 1)
    return F.when(h != "", F.lower(h))


def url_port(url: Column | str) -> Column:
    """Explicit port as a string, or '' when none is present."""
    return F.regexp_extract(_authority(url), r":([0-9]+)$", 1)


def url_path(url: Column | str) -> Column:
    """Path component ('' when absent — normalize_url maps that to '/')."""
    return F.regexp_extract(
        _c(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )


def url_query(url: Column | str) -> Column:
    """Raw query string (no leading '?'), '' when absent."""
    return F.regexp_extract(_c(url), r"\?([^#]*)", 1)


def canonical_query(url: Column | str) -> Column:
    """Query string with tracking params dropped and the rest sorted.

    Sorting is lexicographic over the full ``key=value`` token (binary
    collation — identical in Spark and DuckDB for the ASCII param space),
    which makes the canonical form order-insensitive without needing a
    key/value parse.
    """
    parts = F.split(url_query(url), "&")
    kept = F.filter(
        parts, lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)
    )
    return F.array_join(F.sort_array(kept), "&")


def normalize_url(url: Column | str, strip_www: bool = True) -> Column:
    """Canonical URL: lower scheme+host, drop default ports / fragments /
    tracking params, sort surviving params, '' path -> '/'.

    Two raw spellings of the same page compare equal after this, so exact
    URL dedup (hash-groupBy, like `operators/dedup.exact_duplicates`) works
    on the canonical form. NULL for strings the grammar doesn't cover.
    """
    scheme = url_scheme(url)
    host = url_host(url)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = url_port(url)
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | is_default, "").otherwise(
        F.concat(F.lit(":"), port)
    )
    raw_path = url_path(url)
    path = F.when(raw_path == "", "/").otherwise(raw_path)
    q = canonical_query(url)
    q_part = F.when(q == "", "").otherwise(F.concat(F.lit("?"), q))
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port_part, path, q_part),
    )


def registrable_domain(host: Column | str) -> Column:
    """Registrable ("eTLD+1") domain from a lower-cased host.

    Heuristic PSL: hosts ending in ``<label>.<sl>.<cc>`` where ``sl`` is a
    known second-level suffix and ``cc`` is a 2-letter ccTLD keep three
    labels (``example.co.uk``); everything else keeps the last two. Hosts
    with fewer labels pass through unchanged.
    """
    h = _c(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    tld = F.element_at(parts, -1)
    keep3 = (
        (n >= F.lit(3))
        & second.isin(*_SECOND_LEVEL_SUFFIXES)
        & (F.length(tld) == 2)
    )
    keep = F.when(keep3, F.lit(3)).otherwise(F.lit(2))
    return F.when(n <= 2, h).otherwise(
        F.array_join(F.slice(parts, n - keep + 1, keep), ".")
    )
