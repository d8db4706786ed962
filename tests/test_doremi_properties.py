"""Property tests (hypothesis) for the exact-integer allocation helpers:
these are the primitives every r7 mixture query trusts, so they get
adversarial inputs, not just the fixture's."""

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_application_febuary_spark.operators.doremi import (
    E6,
    _normalize_mixed,
    init_uniform_weights,
    largest_remainder_e6,
    py_fexp_e9,
)

names = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=6),
    min_size=1,
    max_size=40,
    unique=True,
)


@settings(max_examples=200, deadline=None)
@given(names, st.data())
def test_largest_remainder_sums_exactly_and_bounds(keys, data):
    vals = [
        data.draw(st.integers(min_value=0, max_value=10**12), label=k)
        for k in keys
    ]
    if sum(vals) == 0:
        return  # total-zero allocation is undefined by contract
    items = sorted(zip(keys, vals))
    out = largest_remainder_e6(items)
    assert sum(out.values()) == E6
    tot = sum(vals)
    for k, v in items:
        # each weight is within 1 of the exact proportional share
        exact = E6 * v / tot
        assert exact - 1 < out[k] < exact + 1
    # order-preservation: a strictly larger value never gets less
    byval = sorted(items, key=lambda kv: kv[1])
    for (k1, v1), (k2, v2) in zip(byval, byval[1:]):
        if v2 > v1:
            assert out[k2] >= out[k1]


@settings(max_examples=100, deadline=None)
@given(names, st.integers(min_value=0, max_value=900_000), st.data())
def test_normalize_mixed_sums_exactly_and_floors(keys, c, data):
    raws = [
        (k, data.draw(st.integers(min_value=0, max_value=3_000_000)))
        for k in keys
    ]
    if sum(r for _, r in raws) == 0:
        return
    out = _normalize_mixed(sorted(raws), uniform_mix_e6=c)
    assert sum(out.values()) == E6
    # the uniform mix is a floor: every domain gets >= c/D - 1
    floor = c // len(raws) - 1
    assert all(v >= floor for v in out.values())


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=E6))
def test_fexp_monotone_and_bounded(x):
    v = py_fexp_e9(x)
    assert 10**9 <= v <= 2_718_281_829  # e*1e9 ceiling
    assert v * v < (1 << 63)
    if x >= 66:  # one e9-granularity step (2^16/1e3)
        assert py_fexp_e9(x) >= py_fexp_e9(x - 66)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=5000))
def test_init_uniform_exact(n):
    w = init_uniform_weights([f"d{i:04d}" for i in range(n)])
    assert sum(w.values()) == E6
    assert max(w.values()) - min(w.values()) <= 1
