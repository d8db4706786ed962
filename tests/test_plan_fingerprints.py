"""Plan-fingerprint regression gate (VERDICT r5 item 4): every registered
query's pre-AQE physical plan, normalized to its operator-name sequence,
must match the committed snapshot in plan_fingerprints.json. A broadcast
flipping to sort-merge, a new exchange, or a lost codegen span changes
the sequence and fails here — BEFORE it shows up as a bench swing.

Intentional changes: re-run `python scripts/plan_fingerprints.py` (or
with the changed query names) and commit the updated JSON with the code
change — the JSON diff in review is the approval record (workflow
documented in NOTES.md).

Scope: a 24-query sentinel set spanning every plan family (broadcast
join, sort-merge join, window, aggregate, explode/LSH, Arrow UDF, union,
rollup) rather than all 200+ — the full regeneration script covers
everything, but rebuilding every plan per pytest run would double the
suite's runtime for fingerprints that overlap heavily in shape.
"""

import json
from pathlib import Path

import pytest

FP_FILE = Path(__file__).parent / "plan_fingerprints.json"
SF_DIR = "/root/testdata/sf0.001"

# one representative per plan family; failures here indicate a systemic
# planner change, and the regen script shows the full blast radius
SENTINELS = [
    "q1",                       # ts-pushdown scan + agg
    "q10",                      # multi-join + decimal agg
    "tpch_q3_shipping_priority",  # 3-way join + top-k
    "tpch_q8_market_share",     # deep join tree (broadcast dims)
    "scd2_current_state",       # latest-per-key window
    "events_filtered_page",     # TakeOrderedAndProject
    "daily_zero_filled",        # date spine join
    "profile_orders",           # multi-agg profile
    "dedup_clusters",           # iterative components base
    "dedup_minhash_lsh",        # explode + banded self-join
    "ann_topk_bruteforce",      # Arrow-batched matmul path
    "ann_topk_ivf",             # SRP-cell IVF (r6 shape)
    "pagerank_parts",           # fixed-point iteration result
    "corpus_splits",            # portable hash split (r6 shape)
    "documents_mixture",        # portable mixture union
    "cms_user_counts",          # CMS explode + blob rollup
    "hll_shard_distinct",       # HLL sketch + banded verdict
    "value_percentiles_approx",  # sketch + rank-count verify
    "bm25_topk",                # inverted-index join
    "hybrid_retrieval_fusion",  # RRF fusion union
    "grouping_sets_mktsegment_nation",  # grouping sets
    "heavy_hitter_users",       # hot-key aggregation
    "contamination_check_hash",  # broadcast semi-join tiers
    "leakage_safe_splits",      # cluster-join + md5 split
]


@pytest.fixture(scope="module")
def committed():
    assert FP_FILE.exists(), (
        "tests/plan_fingerprints.json missing — run "
        "`python scripts/plan_fingerprints.py` and commit it"
    )
    return json.loads(FP_FILE.read_text())


@pytest.mark.parametrize("name", SENTINELS)
def test_plan_fingerprint_unchanged(spark, committed, name):
    import __spark_entry__ as entrymod
    from scripts.plan_fingerprints import fingerprint

    qs = entrymod.queries()
    assert name in qs, f"sentinel {name} not in registry"
    assert name in committed, (
        f"{name} has no committed fingerprint — run "
        "`python scripts/plan_fingerprints.py {0}`".format(name)
    )
    fp = fingerprint(qs[name](spark, SF_DIR))
    assert fp == committed[name], (
        f"physical plan shape of {name} changed "
        f"(committed {committed[name]}, got {fp}). If intentional, re-run "
        f"`python scripts/plan_fingerprints.py {name}` and commit the "
        "updated tests/plan_fingerprints.json with this change."
    )
