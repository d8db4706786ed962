"""quality_signal_correlation: the exact-moment Pearson chain must agree
with numpy's corrcoef on the same per-doc signals (float reference within
1e-9 — the query itself is pinned bit-exact by the DuckDB oracle)."""

import numpy as np
import pandas as pd

from cdc_application_febuary_spark.queries.corpus_ops import (
    QUERIES,
    _SIGCORR_PAIRS,
)

SF = "/root/testdata/sf0.001"


def test_matches_numpy_corrcoef(spark):
    out = {
        (r["signal_a"], r["signal_b"]): r["corr"]
        for r in QUERIES["quality_signal_correlation"](spark, SF).collect()
    }
    assert set(out) == set(_SIGCORR_PAIRS)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    sig = pd.DataFrame({"chars": docs["n_chars"]})
    toks = docs["text"].str.strip().str.lower().str.split()
    sig["tokens"] = toks.str.len().fillna(0)
    sig["types"] = toks.apply(lambda t: len(set(t)) if isinstance(t, list) else 0)
    sig["top_cnt"] = toks.apply(
        lambda t: max([t.count(w) for w in set(t)]) if isinstance(t, list) and t else 0
    )
    for a, b in _SIGCORR_PAIRS:
        ref = np.corrcoef(sig[a], sig[b])[0, 1]
        assert abs(out[(a, b)] - ref) < 1e-9, (a, b, out[(a, b)], ref)
