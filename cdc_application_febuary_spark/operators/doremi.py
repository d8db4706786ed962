"""DoReMi-style domain-mixture reweighting (Xie et al. 2023,
arXiv:2305.10429): iteratively re-weight the training mixture's DOMAINS
(sources) by exponentiated-gradient / multiplicative-weights updates on a
per-domain "excess loss", then mix with uniform so no domain starves.
The published method measures excess loss with a proxy LM it retrains as
the weights move; a SQL-replayable engine has no proxy model, so the
excess-loss role is played by an exactly-computable surrogate with the
same fixed-point structure: each domain's χ²-style divergence from the
CURRENT weighted mixture unigram,

    lambda_d = max(0, sum_w p_d(w) * (p_d(w) - p_mix(w)))

which, like DoReMi's excess loss, shrinks for domains the mixture already
covers and grows for outliers — and genuinely changes every step because
``p_mix`` is rebuilt from the current weights (the coupling that makes
the iteration non-degenerate). Being polynomial in the probabilities it
needs no transcendental beyond exp, and exp is computed by the exact
fixed-point squaring form both engines replay bit-for-bit.

Everything is BIGINT fixed point (the pagerank_fixedpoint /
quality_classifier discipline):

* domain unigrams ``p_d(w) = (count * 1e9) div total_d``      (e9);
* mixture ``p_mix(w) = (sum_d alpha_d * p_d(w)) div 1e6``     (e9);
* per-word divergence terms truncate toward zero at e9 BEFORE summing
  (Spark ``div`` == DuckDB CASE-flipped ``//`` on signed values);
* step ``x = min(lambda * eta div 1000, 1e6)``                 (e6);
* ``fexp(x) = ((1e9 + x*1000 div 2^16) squared 16 times, div 1e9
  each)`` — the (1 + x/n)^n form, n = 2^16, every op integer; the e9
  working scale keeps exponent granularity ~6.6e-5, and the hard 1e6
  step cap keeps the peak square at 7.39e18 < 2^63-1;
* weights renormalize to EXACTLY 1e6 by largest-remainder allocation
  (ties broken by domain name), then mix ``(1-c)*alpha + c*uniform``
  folded scale-free into one largest-remainder pass so the invariant
  ``sum(alpha) == 1e6`` holds after every step.

Spark-first shape: the corpus-sized work — tokenize/explode, the
(domain, word) count, the word-keyed mixture join, the domain-keyed
divergence sum — is all DataFrame ops with map-side combine; the per-step
driver state is ONE row per domain (the exp/renormalize arithmetic on D
bounded values, the same bounded-scalar pattern as
``operators/graph.py``'s pagerank iterations). No reference analog (the
reference backend has no corpus mixing); recipe from the published paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

E6 = 1_000_000
E9 = 1_000_000_000
EXP_SHIFT = 16  # fexp squaring depth: n = 2^16


def _py_tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Python // floors)."""
    q = abs(a) // b
    return -q if a < 0 else q


def py_fexp_e9(x_e6: int) -> int:
    """Fixed-point exp: input x in e6, output e9. Computes
    ``(1 + (x*1000 div 2^16)/1e9)^(2^16)`` truncating at e9 after every
    squaring — exact-integer, so Spark/DuckDB/Python agree bit-for-bit.
    The e9 working scale keeps the exponent granularity at ~6.6e-5 (an
    e6-scale chain would quantize steps to 0.066 and zero out small
    updates). Requires 0 <= x <= 1e6: at x == 1e6 the chain peaks at
    e*1e9 whose square is 7.39e18 < 2^63-1; anything larger overflows,
    which is why callers MUST cap the step at E6."""
    v = E9 + (x_e6 * 1000) // (1 << EXP_SHIFT)
    for _ in range(EXP_SHIFT):
        v = (v * v) // E9
    return v


def domain_unigram_probs(
    docs: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """(d, w, p): per-domain word-unigram probabilities in e9 fixed point,
    ``p = (count(d,w) * 1e9) div total_tokens(d)``. One explode + two
    word/domain-keyed aggs, all map-side combinable and bounded by
    vocabulary x domains, not corpus size."""
    from ..functions import text as T

    toks = docs.select(
        F.col(domain_col).alias("d"),
        F.explode(T.tokens(F.col(text_col))).alias("w"),
    )
    cnt = toks.groupBy("d", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("d").agg(F.sum("c").alias("t"))
    return cnt.join(tot, "d").select(
        "d", "w", F.expr(f"CAST(c * {E9} div t AS BIGINT)").alias("p")
    )


def _normalize_mixed(
    raws: list[tuple[str, int]], uniform_mix_e6: int
) -> dict[str, int]:
    """Largest-remainder renormalization of raw multiplicative-weight
    scores folded with the uniform mix, summing to EXACTLY 1e6.

    Scale-free fold: ``m_d = (1e6 - c) * raw_d * D + c * S`` with
    ``S = sum(raw)`` gives ``sum(m) = D * S * 1e6`` exactly, so the base
    allocation is ``m_d div (D * S)`` and the deficit (< D) goes to the
    largest remainders, ties to the smaller domain name.
    """
    dd = len(raws)
    s = sum(r for _, r in raws)
    denom = dd * s
    mixed = [
        (d, (E6 - uniform_mix_e6) * r * dd + uniform_mix_e6 * s)
        for d, r in raws
    ]
    base = {d: m // denom for d, m in mixed}
    deficit = E6 - sum(base.values())
    order = sorted(mixed, key=lambda dm: (-(dm[1] % denom), dm[0]))
    for d, _ in order[:deficit]:
        base[d] += 1
    return base


def init_uniform_weights(domains: list[str]) -> dict[str, int]:
    """Uniform e6 weights summing to exactly 1e6: base + 1 for the first
    ``1e6 % D`` domains in name order."""
    dd = len(domains)
    base, r = divmod(E6, dd)
    return {d: base + (1 if i < r else 0) for i, d in enumerate(sorted(domains))}


def doremi_domain_weights(
    docs: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
    iters: int = 5,
    eta: int = 800,
    uniform_mix_e6: int = 200_000,
) -> DataFrame:
    """Run ``iters`` multiplicative-weights steps and return one row per
    domain: ``(domain, n_docs, n_tokens, lambda_e9, alpha_e6)`` where
    ``lambda_e9`` is the final step's excess divergence and ``alpha_e6``
    the final mixture weight (sums to exactly 1e6 across domains).

    Per step the cluster computes the word-keyed mixture and the
    domain-keyed divergence; the driver touches only D rows (bounded by
    the number of domains — the pagerank bounded-scalar pattern), runs
    the exact-integer exp/renormalize, and feeds the next broadcast
    weight table. ``eta`` scales the step as ``x = lambda_e9 * eta div
    1000`` (e6), hard-capped at 1e6 (one e-fold per step) so fexp never
    overflows BIGINT regardless of how concentrated a domain's
    vocabulary is.
    """
    from ..functions import text as T

    spark = docs.sparkSession
    # persist hash-partitioned by w (r10): every iteration joins probs by
    # w twice (the mixture groupBy and the divergence join) — caching the
    # repartitioned frame lets those reuse the stored partitioning
    # instead of re-exchanging the vocab x domains table per step
    probs = domain_unigram_probs(docs, text_col, domain_col)
    probs = probs.repartition("w").persist()
    # domain spine + token totals (n_tokens = what the probs denominate
    # by) in ONE aggregation (r10): sum(size(tokens)) counts exactly what
    # the old explode-then-count counted (empty/NULL token arrays
    # contribute 0 rows there and 0/NULL here), for one corpus scan and
    # no join instead of two tokenizing scans joined by domain
    stats = {
        r["d"]: (int(r["nd"]), int(r["nt"]))
        for r in docs.groupBy(F.col(domain_col).alias("d"))
        .agg(
            F.count(F.lit(1)).alias("nd"),
            # coalesce: sum() over an ALL-NULL-text domain is NULL (the
            # old explode+inner-join dropped such a domain outright) — 0
            # keeps the stat defined instead of TypeError-ing in int()
            # (ADVICE r10); per-doc semantics are unchanged (NULL size is
            # skipped by sum exactly as explode contributed 0 rows)
            F.coalesce(
                F.sum(F.size(T.tokens(F.col(text_col)))), F.lit(0)
            ).alias("nt"),
        )
        .collect()
    }
    domains = sorted(stats)
    alpha = init_uniform_weights(domains)
    lam: dict[str, int] = {d: 0 for d in domains}
    for _ in range(max(1, iters)):
        wdf = spark.createDataFrame(
            [(d, alpha[d]) for d in domains], "d string, a long"
        )
        pmix = (
            probs.join(F.broadcast(wdf), "d")
            .groupBy("w")
            .agg(F.expr(f"CAST(sum(a * p) div {E6} AS BIGINT)").alias("pm"))
        )
        lam_rows = (
            probs.join(pmix, "w")
            .groupBy("d")
            .agg(
                F.expr(
                    f"CAST(greatest(sum(p * (p - pm) div {E9}), 0) AS BIGINT)"
                ).alias("lam")
            )
            .collect()
        )
        lam = {r["d"]: int(r["lam"]) for r in lam_rows}
        raws = []
        for d in domains:
            x = min(lam.get(d, 0) * eta // 1000, E6)
            raws.append((d, alpha[d] * py_fexp_e9(x) // E9))
        alpha = _normalize_mixed(raws, uniform_mix_e6)
    probs.unpersist()
    out_rows = [
        (d, stats[d][0], stats[d][1], lam.get(d, 0), alpha[d])
        for d in domains
    ]
    return spark.createDataFrame(
        out_rows,
        "domain string, n_docs bigint, n_tokens bigint, "
        "lambda_e9 bigint, alpha_e6 bigint",
    ).orderBy("domain")


def largest_remainder_e6(items: list[tuple[str, int]]) -> dict[str, int]:
    """Allocate exactly 1e6 proportionally to ``items``' values by the
    largest-remainder method: base = (1e6*v) div total, the deficit
    (< len(items)) goes to the largest remainders, ties to the smaller
    key. The plain form of ``_normalize_mixed`` (no uniform fold) —
    shared by the temperature-mixture allocation."""
    tot = sum(v for _, v in items)
    base = {k: (E6 * v) // tot for k, v in items}
    deficit = E6 - sum(base.values())
    order = sorted(items, key=lambda kv: (-((E6 * kv[1]) % tot), kv[0]))
    for k, _ in order[:deficit]:
        base[k] += 1
    return base


def mixture_temperature_allocation(
    docs: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """Temperature-scaled mixture allocation (the tau-sampling used for
    multilingual/multi-source training mixes, e.g. mT5 §3.1): sampling
    weight proportional to n_tokens^tau with tau = 0.5, computed EXACTLY
    as ``isqrt(n_tokens)`` (math.isqrt — true integer sqrt) and
    normalized to exactly 1e6 by largest remainder; the proportional
    (tau = 1) allocation rides along so the flattening is visible.

    One corpus-sized agg (per-domain doc/token counts); the allocation
    itself runs on D driver rows (bounded by domain count) in exact
    Python integers — no float touches any output.
    """
    from ..functions import text as T

    spark = docs.sparkSession
    rows = (
        docs.select(
            F.col(domain_col).alias("d"),
            F.size(T.tokens(F.col(text_col))).alias("ntok"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
        .collect()
    )
    import math

    stats = {r["d"]: (int(r["n_docs"]), int(r["n_tokens"])) for r in rows}
    iq = {d: math.isqrt(nt) for d, (_, nt) in stats.items()}
    w_tau = largest_remainder_e6(sorted(iq.items()))
    w_prop = largest_remainder_e6(
        sorted((d, nt) for d, (_, nt) in stats.items())
    )
    out = [
        (d, stats[d][0], stats[d][1], iq[d], w_tau[d], w_prop[d])
        for d in sorted(stats)
    ]
    return spark.createDataFrame(
        out,
        "domain string, n_docs bigint, n_tokens bigint, isqrt_tokens bigint,"
        " weight_tau05_e6 bigint, weight_prop_e6 bigint",
    ).orderBy("domain")


def token_budget_epochs(
    docs: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
    budget_multiplier_pct: int = 200,
    max_epochs: int = 4,
) -> DataFrame:
    """Data-constrained epoch allocation (Muennighoff et al. 2023,
    arXiv:2305.16264: repeating data up to ~4 epochs is nearly as good as
    fresh data; beyond that returns decay fast): turn the tau=0.5 mixture
    weights into an executable sampling plan for a token budget of
    ``budget_multiplier_pct`` percent of the corpus.

    Per domain, all exact integers: ``target = budget * w div 1e6``,
    ``full_epochs = min(max_epochs, target div n_tokens)``,
    ``partial_tokens`` = the remainder sampled in the final partial epoch
    (zero when the cap binds), ``capped`` when the target exceeds
    ``max_epochs`` whole epochs, and ``unused_budget`` = tokens the cap
    left unspent (a real run would re-waterfill these into uncapped
    domains; reporting them keeps the single pass exact and auditable).
    """
    import math

    from ..functions import text as T

    spark = docs.sparkSession
    rows = (
        docs.select(
            F.col(domain_col).alias("d"),
            F.size(T.tokens(F.col(text_col))).alias("ntok"),
        )
        .groupBy("d")
        .agg(F.sum("ntok").cast("long").alias("n_tokens"))
        .collect()
    )
    nt = {r["d"]: int(r["n_tokens"]) for r in rows}
    total = sum(nt.values())
    budget = (total * budget_multiplier_pct) // 100
    w = largest_remainder_e6(
        sorted((d, math.isqrt(v)) for d, v in nt.items())
    )
    out = []
    for d in sorted(nt):
        n = nt[d]
        if n == 0:
            # a token-less domain can't be sampled: no plan row (and its
            # isqrt weight is 0, so it claims no budget either)
            continue
        target = (budget * w[d]) // E6
        full = min(max_epochs, target // n)
        capped = target > max_epochs * n
        partial = 0 if capped else target - full * n
        unused = target - (full * n + partial)
        out.append((d, n, w[d], target, full, partial, capped, unused))
    return spark.createDataFrame(
        out,
        "domain string, n_tokens bigint, weight_tau05_e6 bigint,"
        " target_tokens bigint, full_epochs bigint, partial_tokens bigint,"
        " capped boolean, unused_budget bigint",
    ).orderBy("domain")
