"""Property-based invariants for functions/url.py: normalization is
idempotent, and invariant under the spelling degrees of freedom it claims
to collapse (case, www, default ports, param order, tracking params,
fragments)."""

import random

import pytest
from hypothesis import given, settings, strategies as st

from cdc_application_febuary_spark.functions import url as U

LABEL = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
PARAM_KEY = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = ".".join(draw(st.lists(LABEL, min_size=2, max_size=4)))
    www = draw(st.booleans())
    default_port = draw(st.booleans())
    port = (
        (":80" if scheme == "http" else ":443")
        if default_port
        else draw(st.sampled_from(["", ":8080", ":9443"]))
    )
    path = "/" + "/".join(draw(st.lists(LABEL, min_size=0, max_size=3)))
    params = draw(
        st.lists(
            st.tuples(PARAM_KEY, LABEL).map(lambda kv: f"{kv[0]}={kv[1]}"),
            min_size=0,
            max_size=4,
            unique=True,
        )
    )
    trackers = draw(
        st.lists(
            st.sampled_from(
                ["utm_source=x", "UTM_Medium=y", "fbclid=z", "GCLID=q"]
            ),
            min_size=0,
            max_size=2,
            unique=True,
        )
    )
    frag = draw(st.sampled_from(["", "#frag", "#a1"]))
    allp = params + trackers
    rnd = random.Random(draw(st.integers(0, 2**16)))
    rnd.shuffle(allp)
    q = ("?" + "&".join(allp)) if allp else ""
    spelled_scheme = draw(st.sampled_from([scheme, scheme.upper()]))
    spelled_host = draw(st.sampled_from([host, host.upper()]))
    full_host = ("WWW." if www else "") + spelled_host
    return (
        f"{spelled_scheme}://{full_host}{port}{path}{q}{frag}",
        f"{scheme}://{host}{port if not default_port else ''}{path}"
        + (("?" + "&".join(sorted(params))) if params else ""),
    )


@pytest.fixture(scope="module")
def normalizer(spark):
    def norm(values):
        df = spark.createDataFrame([(v,) for v in values], ["url"])
        return [
            r["c"]
            for r in df.select(U.normalize_url("url").alias("c")).collect()
        ]

    return norm


@settings(max_examples=30, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=8))
def test_normalize_matches_spec_and_is_idempotent(normalizer, cases):
    raw = [u for u, _ in cases]
    expected = [e for _, e in cases]
    got = normalizer(raw)
    # expected form: lower scheme+host, no www, no default port, sorted
    # non-tracking params, no fragment, '' path -> handled by min path '/'
    assert got == expected
    # idempotence: normalizing a canonical URL is the identity
    assert normalizer(got) == got
