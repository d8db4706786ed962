"""DoReMi-style domain reweighting (operators/doremi.py): fexp parity
and bounds, largest-remainder invariants, and operator semantics on a
hand-built corpus (outlier domain gains weight; weights always sum to
exactly 1e6; partitioning-invariant)."""

import math

from cdc_application_febuary_spark.operators.doremi import (
    E6,
    E9,
    _normalize_mixed,
    doremi_domain_weights,
    init_uniform_weights,
    py_fexp_e9,
)


def test_fexp_tracks_exp_and_stays_in_bigint():
    for x in (0, 1, 1000, 65_000, 500_000, 999_999, E6):
        v = py_fexp_e9(x)
        # quantized exponent: x*1000 is floored to 2^16 units on the e9
        # scale, so the effective exponent is q*2^16/1e9
        xq = ((x * 1000) // (1 << 16)) * (1 << 16) / 1e9
        assert abs(v / E9 - math.exp(xq)) < 2e-3
        assert v * v < (1 << 63)  # one more squaring would still fit
    assert py_fexp_e9(0) == E9


def test_fexp_resolves_small_steps():
    # the e6-scale chain would floor any x < 65536 to zero movement;
    # the e9 chain must not
    assert py_fexp_e9(60_000) > E9


def test_init_uniform_sums_exactly():
    for n in (3, 7, 20, 999):
        w = init_uniform_weights([f"d{i:03d}" for i in range(n)])
        assert sum(w.values()) == E6
        assert max(w.values()) - min(w.values()) <= 1


def test_normalize_mixed_invariants():
    raws = [("a", 2_700_000), ("b", 1_000_000), ("c", 1_000_001)]
    out = _normalize_mixed(raws, uniform_mix_e6=200_000)
    assert sum(out.values()) == E6
    # ordering preserved: larger raw -> weight >= smaller raw's
    assert out["a"] > out["c"] >= out["b"]
    # uniform floor: c=0.2 guarantees every domain >= c/D (minus rounding)
    assert min(out.values()) >= 200_000 // 3 - 1


def _toy_docs(spark):
    # two look-alike domains and one vocabulary outlier
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta", "news"))
        rows.append((100 + i, "alpha beta gamma epsilon", "web"))
        rows.append((200 + i, "zeta zeta eta theta iota", "code"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_outlier_domain_gains_weight(spark):
    out = {
        r["domain"]: r.asDict()
        for r in doremi_domain_weights(_toy_docs(spark), iters=3).collect()
    }
    assert sum(r["alpha_e6"] for r in out.values()) == E6
    # the vocabulary outlier diverges most from the mixture
    assert out["code"]["lambda_e9"] > out["news"]["lambda_e9"]
    assert out["code"]["alpha_e6"] > out["news"]["alpha_e6"]
    assert out["code"]["alpha_e6"] > out["web"]["alpha_e6"]
    assert out["news"]["n_docs"] == 30 and out["news"]["n_tokens"] == 120


def test_partitioning_invariant(spark):
    docs = _toy_docs(spark)
    a = sorted(map(tuple, doremi_domain_weights(docs, iters=2).collect()))
    b = sorted(
        map(
            tuple,
            doremi_domain_weights(docs.repartition(7), iters=2).collect(),
        )
    )
    assert a == b


def test_largest_remainder_exact():
    from cdc_application_febuary_spark.operators.doremi import (
        largest_remainder_e6,
    )

    items = [("a", 1), ("b", 1), ("c", 1)]
    out = largest_remainder_e6(items)
    assert sum(out.values()) == E6
    # deficit 1 goes to the smallest key on a full tie
    assert out["a"] == 333334 and out["b"] == out["c"] == 333333


def test_mixture_temperature_flattens(spark):
    from cdc_application_febuary_spark.operators.doremi import (
        mixture_temperature_allocation,
    )

    rows = []
    for i in range(90):
        rows.append((i, "big corpus words here now", "big"))
    for i in range(10):
        rows.append((100 + i, "tiny corpus words here now", "tiny"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {
        r["domain"]: r.asDict()
        for r in mixture_temperature_allocation(docs).collect()
    }
    assert out["big"]["weight_prop_e6"] + out["tiny"]["weight_prop_e6"] == E6
    assert out["big"]["weight_tau05_e6"] + out["tiny"]["weight_tau05_e6"] == E6
    # tau=1: 90/10 split exactly; tau=0.5 flattens toward 3:1
    assert out["big"]["weight_prop_e6"] == 900_000
    assert out["tiny"]["weight_tau05_e6"] > out["tiny"]["weight_prop_e6"]
    assert out["big"]["weight_tau05_e6"] == 750_000  # isqrt(450)/isqrt(50)=3:1


def test_token_budget_epochs_caps_and_conserves(spark):
    from cdc_application_febuary_spark.operators.doremi import (
        token_budget_epochs,
    )

    rows = []
    for i in range(90):
        rows.append((i, "big corpus words here now", "big"))
    for i in range(10):
        rows.append((100 + i, "tiny corpus words here now", "tiny"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {
        r["domain"]: r.asDict()
        for r in token_budget_epochs(
            docs, budget_multiplier_pct=400, max_epochs=4
        ).collect()
    }
    # tiny gets tau-boosted far past 4 epochs of its 50 tokens -> capped
    t = out["tiny"]
    assert t["capped"] and t["full_epochs"] == 4 and t["partial_tokens"] == 0
    assert t["unused_budget"] == t["target_tokens"] - 4 * t["n_tokens"]
    b = out["big"]
    assert not b["capped"]
    assert (
        b["full_epochs"] * b["n_tokens"] + b["partial_tokens"]
        == b["target_tokens"]
    )
