"""Dataset sampling and mixture construction — the "data mixing" step of
a training-data pipeline (choose per-source sampling rates to hit target
mixture weights, optionally with upsampling by integer replication).

Scale shape: everything is per-row Bernoulli against a seeded
deterministic hash — no shuffle, no count-then-sample second pass except
where explicitly requested (`exact` weights need one count per source,
a metadata-cheap aggregate). Hash-based sampling (xxhash64(id, seed))
rather than Spark's `sample()` RNG makes the draw a pure function of
(id, seed): reproducible across runs, partitionings, AND engines — the
property that matters when a 100 TB mixture must be re-materialized
identically.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, functions as F

# xxhash64 output spans the full signed 64-bit range; map to [0, 1)
_SPAN = float(1 << 64)


def _unit_hash(id_col: str, seed: int):
    """Deterministic U[0,1) from (id, seed) — same value on any engine
    that implements xxhash64."""
    return (F.xxhash64(F.col(id_col), F.lit(seed)).cast("double") / _SPAN) + 0.5


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep rows whose unit hash < fraction. Pure filter: pushes down,
    no shuffle, reproducible for a fixed (id set, seed)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(_unit_hash(id_col, seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum hash sampling; strata absent from `fractions` are
    dropped (explicit beats implicit for mixture construction)."""
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col(strata_col)]
    return df.where(
        frac.isNotNull() & (_unit_hash(id_col, seed) < frac)
    )


def mixture(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    id_col: str,
    seed: int = 0,
    counts: Mapping[str, int] | None = None,
) -> DataFrame:
    """Union the sources, each downsampled so the EXPECTED output
    composition matches `weights` (normalized). The largest
    weight-to-size ratio anchors at fraction 1.0 (no upsampling) and the
    rest scale under it; one `count()` per source prices the anchor —
    the only non-streaming-friendly step, and a metadata-only aggregate
    on parquet sources.

    Adds a `__mix_source` column naming each row's origin. When the
    sources are strata of one parent table, pass `counts` from a single
    grouped count instead of paying one count job per source."""
    if set(sources) != set(weights):
        raise ValueError("sources and weights must cover the same keys")
    total_w = float(sum(weights.values()))
    if counts is None:
        counts = {k: df.count() for k, df in sources.items()}
    elif set(counts) != set(sources):
        raise ValueError("counts must cover the same keys as sources")
    if any(c == 0 for c in counts.values()):
        empty = [k for k, c in counts.items() if c == 0]
        raise ValueError(f"empty mixture source(s): {empty}")
    # anchor s.t. max fraction == 1.0
    ratios = {k: (weights[k] / total_w) / counts[k] for k in sources}
    anchor = max(ratios.values())
    out = None
    for k, df in sources.items():
        frac = ratios[k] / anchor
        part = hash_sample(df, id_col, frac, seed).withColumn(
            "__mix_source", F.lit(k)
        )
        out = part if out is None else out.unionByName(part)
    return out


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float] | None = None,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic dataset splitting: assign every row to exactly one
    named split by where its unit hash lands in the cumulative fraction
    intervals. Properties that matter for training data:

    * a row's split is a pure function of (id, seed) — stable across
      runs, partitionings, engines, and INCREMENTAL ARRIVALS: new rows
      join a split without reshuffling old ones (no global count, no
      ntile), which is how a continuously-ingested corpus keeps its
      held-out set honest;
    * splits are disjoint and exhaustive by construction (half-open
      interval cover of [0, 1));
    * leakage control composes: split on a GROUP id (e.g. the dedup
      cluster id) instead of the row id and near-duplicates can never
      straddle train/test.
    """
    fractions = dict(fractions or {"train": 0.8, "val": 0.1, "test": 0.1})
    if not fractions:
        raise ValueError("need at least one split")
    total = sum(fractions.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = _unit_hash(id_col, seed)
    expr = None
    edge = 0.0
    names = list(fractions)
    for name in names[:-1]:
        edge += fractions[name]
        clause = F.when(u < F.lit(edge), F.lit(name))
        expr = clause if expr is None else expr.when(u < F.lit(edge), F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of exactly ``k`` rows
    (or all rows when fewer), via the Efraimidis-Spirakis A-ES key:
    ``key = u^(1/w)`` with ``u = unit_hash(id, seed)`` — the top-k rows by
    key are a weighted sample. P(row in sample) increases with its weight,
    and the draw is a pure function of (id set, weights, seed):
    reproducible across runs and partitionings, like every sampler here.

    Plan shape: one key expression + a distributed top-k
    (TakeOrderedAndProject via orderBy/limit) — no shuffle of the
    un-sampled rows, no per-source counts. Rows with weight <= 0 or NULL
    never qualify. Computed in log space (``ln(u)/w``, maximizing) for
    numerical stability at tiny weights."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    # ln(u) in (-inf, 0); dividing by w makes larger weights -> closer to 0
    key = F.log(_unit_hash(id_col, seed)) / w
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("__aes_key", key)
        .orderBy(F.desc("__aes_key"))
        .limit(k)
        .drop("__aes_key")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    train_tenths: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Group-aware train/valid split: near-duplicate CLUSTERS never
    straddle the boundary.

    A hash split on doc ids leaks: a document and its near-duplicate can
    land on opposite sides, and the eval set silently contains training
    data (the standard contamination failure of random splits — the
    reason decontamination pipelines split by cluster, not by document).
    Here the near-dup pair set is folded to connected components
    (`dedup.dedup_clusters` — min-label propagation, docs outside any
    pair are their own cluster) and the split decision hashes the CLUSTER
    id, so every member follows its cluster.

    The hash is md5 of the decimal cluster id (``conv(substr(md5(x),1,8),
    16,10) % 10 < train_tenths``) — deliberately md5, not xxhash64:
    engine-portable, so a DuckDB oracle reproduces the exact assignment
    and the split is stable across runs, partitionings, and engines.
    Granularity is tenths (default 8 = 80/20). Adds ``cluster`` and
    ``split`` columns; one equi-join against the (tiny) cluster map, no
    extra shuffle of the corpus beyond it."""
    from . import dedup as D

    cl = D.dedup_clusters(pairs).select(
        F.col("doc_id").alias(id_col), "cluster"
    )
    with_cluster = docs.join(cl, id_col, "left").withColumn(
        "cluster", F.coalesce(F.col("cluster"), F.col(id_col))
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("cluster").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 10
    )
    return with_cluster.withColumn(
        "split",
        F.when(bucket < train_tenths, F.lit("train")).otherwise(
            F.lit("valid")
        ),
    )


# ---------------------------------------------------------------------------
# Portable (engine-parity) samplers: md5-based 32-bit unit hash
# ---------------------------------------------------------------------------
# The xxhash64 samplers above are the cheap production tier (one JVM hash
# per row, no string materialization). The portable tier below hashes the
# DECIMAL STRING of the id through md5 and takes the leading 32 bits —
# reproducible bit-for-bit in any engine with md5 (DuckDB:
# ``('0x' || substr(md5(x), 1, 8))::BIGINT``), the property that lets a
# SQL oracle replay the exact draw. Thresholds are INTEGERS on the
# [0, 2^32) hash line (never float fractions), so membership is pure
# integer comparison on both engines. Cost note: md5-of-string is ~5x an
# xxhash64 — still a map-only filter that pushes down and shuffles
# nothing, so the 100 TB shape is unchanged.

_HASH_SPAN = 1 << 32  # md5 leading 8 hex chars


def portable_unit_hash32(id_col: str, seed: int = 0):
    """BIGINT in [0, 2^32): leading 32 bits of md5("<id>:<seed>")."""
    key = F.concat_ws(
        ":", F.col(id_col).cast("string"), F.lit(str(int(seed)))
    )
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")


def portable_unit_hash32_sql(id_expr: str, seed: int = 0) -> str:
    """The DuckDB twin of :func:`portable_unit_hash32` (same bits)."""
    return (
        f"('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || ':{int(seed)}'),"
        " 1, 8))::BIGINT"
    )


def embedding_fingerprint(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One-row (fixture_fp bigint) content fingerprint of a vector table,
    identical in any engine with md5 (VERDICT r8 item 4): every
    coordinate quantizes by ``floor(CAST(v AS DOUBLE) * 2^20)`` (exact
    IEEE float->double cast, correctly-rounded multiply, floor — the
    drift-bucket convention), each (id, dim, q) triple hashes through the
    portable 32-bit md5 line, and the BIGINT sum over the table is the
    fingerprint (order-independent exact integer sum; max 2^32 per term
    keeps any realistic table far below 2^63). Recall-floor calibrations
    (ann_topk_lsh / dedup_embedding_srp / semantic_dedup_report) embed
    this as a hash-compared column so a regenerated embeddings fixture
    FAILS the gate and forces a floor re-measure instead of silently
    grading against stale calibration. SQL twin:
    :func:`embedding_fingerprint_sql`."""
    q = F.expr(
        f"transform({vec_col},"
        " v -> CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT))"
    )
    exploded = df.select(
        F.col(id_col).alias("_id"), F.posexplode(q).alias("_dim", "_q")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("_id").cast("string"),
                    F.col("_dim").cast("string"),
                    F.col("_q").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    # COALESCE: an EMPTY table sums to NULL on both engines — fingerprint
    # it as 0 (still != any real calibration fp, so the gate stays loud)
    # instead of TypeError-ing at the int() call site (ADVICE r8).
    return exploded.agg(
        F.coalesce(F.sum(h).cast("bigint"), F.lit(0).cast("bigint")).alias(
            "fixture_fp"
        )
    )


def embedding_fingerprint_sql(table: str = "embeddings") -> str:
    """DuckDB twin of :func:`embedding_fingerprint` (same BIGINT)."""
    return f"""
SELECT CAST(COALESCE(SUM(('0x' || substr(md5(
         CAST(vec_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR) || ':'
         || CAST(CAST(floor(emb[i] * 1048576) AS BIGINT) AS VARCHAR)
       ), 1, 8))::BIGINT), 0) AS BIGINT) AS fixture_fp
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM {table}),
     UNNEST(generate_series(1, len(emb))) AS t(i)
""".strip()


def split_thresholds(fractions: Mapping[str, float]) -> list[tuple[str, int]]:
    """(name, cumulative-integer-threshold) pairs on the 2^32 hash line,
    computed once driver-side in exact Python arithmetic; the final split
    absorbs the rounding remainder (thresholds cover [0, 2^32) exactly)."""
    total = float(sum(fractions.values()))
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, edge = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        edge += fractions[name]
        out.append((name, int(edge * _HASH_SPAN)))
    out.append((names[-1], _HASH_SPAN))
    return out


def train_val_test_split_portable(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float] | None = None,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """:func:`train_val_test_split` with the portable hash: identical
    stability/disjointness/incremental-arrival properties, plus
    engine-parity — a SQL oracle reproduces every assignment."""
    fractions = dict(fractions or {"train": 0.8, "val": 0.1, "test": 0.1})
    h = portable_unit_hash32(id_col, seed)
    expr = None
    for name, thr in split_thresholds(fractions)[:-1]:
        clause_val = F.lit(name)
        expr = (
            F.when(h < F.lit(thr), clause_val)
            if expr is None
            else expr.when(h < F.lit(thr), clause_val)
        )
    last = F.lit(list(fractions)[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def mixture_portable(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, int],
    id_col: str,
    seed: int = 0,
    counts: Mapping[str, int] | None = None,
) -> DataFrame:
    """:func:`mixture` with INTEGER weights and the portable hash: the
    per-source keep-threshold is the exact rational
    ``(w_k / cnt_k) / (w_a / cnt_a)`` scaled to the 2^32 hash line and
    floored in arbitrary-precision Python ints (no float in the decision
    path), where the anchor ``a`` maximizes ``w/cnt`` (ties break on the
    source name — deterministic). A SQL oracle recomputes the same
    counts, anchor, and thresholds and replays the exact draw."""
    if set(sources) != set(weights):
        raise ValueError("sources and weights must cover the same keys")
    if any(int(w) != w or w <= 0 for w in weights.values()):
        raise ValueError("mixture_portable needs positive integer weights")
    if counts is None:
        counts = {k: df.count() for k, df in sources.items()}
    elif set(counts) != set(sources):
        raise ValueError("counts must cover the same keys as sources")
    if any(c == 0 for c in counts.values()):
        empty = [k for k, c in counts.items() if c == 0]
        raise ValueError(f"empty mixture source(s): {empty}")
    # anchor = max w/cnt == min cnt/w; ties on name for determinism
    anchor = min(sorted(counts), key=lambda k: (counts[k] / weights[k], k))
    wa, ca = int(weights[anchor]), int(counts[anchor])
    out = None
    for k in sorted(sources):
        # frac_k = (w_k * cnt_a) / (w_a * cnt_k), anchor gets exactly 1.0
        thr = (_HASH_SPAN * int(weights[k]) * ca) // (wa * int(counts[k]))
        part = (
            sources[k]
            .where(portable_unit_hash32(id_col, seed) < F.lit(min(thr, _HASH_SPAN)))
            .withColumn("__mix_source", F.lit(k))
        )
        out = part if out is None else out.unionByName(part)
    return out


def weighted_sample_portable(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Weighted sample without replacement of ``k`` rows via PRIORITY
    SAMPLING (Duffield-Lund-Thorup, JACM 2007): priority = w/u with
    u ~ U(0,1], take the top-k priorities. Unlike the A-ES key u^(1/w)
    (:func:`weighted_sample`, irrational — no exact cross-engine order),
    the priority ORDER is decidable in integer arithmetic:
    w1/u1 > w2/u2  <=>  w1*u2 > w2*u1. We materialize it as the exact
    integer key ``(w << 44) div u`` with u the md5 32-bit unit hash
    (+1, avoiding 0) — floor quantization is deterministic and identical
    in any engine, and ties (same floored key) break on id, so the drawn
    set is a pure function of (id set, integer weights, seed) in BOTH
    Spark and SQL. Integer weights up to 2^19 (=524288) keep w * 2^44
    inside BIGINT — guarded with a clear error (w must stay STRICTLY
    below 2^19: w == 2^19 makes w * 2^44 = 2^63, which already overflows
    signed BIGINT); same top-k plan shape as the A-ES tier."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("long")
    u = portable_unit_hash32(id_col, seed) + F.lit(1)
    key = F.expr(
        f"(CAST({weight_col} AS BIGINT) * 17592186044416) div (__psp_u)"
    )
    # ANSI overflow on w >= 2^19 would be a cryptic task error (and
    # non-ANSI silently wraps w * 2^44 = 2^63 to a negative key) — fail
    # the plan with the contract instead. w == 2^19 exactly is already
    # out of range: 2^19 * 2^44 = 2^63 > BIGINT max.
    guard = F.when(
        w >= F.lit(1 << 19),
        F.raise_error(
            F.lit("weighted_sample_portable: weight must be < 2^19")
        ),
    ).otherwise(F.lit(1))
    return (
        df.where(w.isNotNull() & (w > 0) & (guard == 1))
        .withColumn("__psp_u", u)
        .withColumn("__psp_key", key)
        .orderBy(F.desc("__psp_key"), F.col(id_col))
        .limit(k)
        .drop("__psp_u", "__psp_key")
    )


def allocate_exact(
    items: list[tuple[str, int]], total: int
) -> dict[str, int]:
    """Largest-remainder allocation of exactly ``total`` units
    proportional to ``items``' (non-negative integer) sizes: base =
    (total*size) div N, the deficit (< len(items)) goes to the largest
    remainders, ties to the smaller key. All exact Python ints — the
    generic-total form of ``doremi.largest_remainder_e6``.

    Guarantee used by :func:`stratified_sample_exact`: when
    ``total <= N`` no quota exceeds its stratum size (base < size
    whenever total < N, and total == N gives base == size with zero
    remainder), so per-stratum top-``quota`` never runs dry."""
    if total < 0:
        raise ValueError("total must be >= 0")
    n = sum(v for _, v in items)
    if n == 0:
        raise ValueError("allocate_exact over empty strata")
    if total > n:
        raise ValueError(f"total {total} exceeds population {n}")
    base = {k: (total * v) // n for k, v in items}
    deficit = total - sum(base.values())
    order = sorted(items, key=lambda kv: (-((total * kv[1]) % n), kv[0]))
    for k, _ in order[:deficit]:
        base[k] += 1
    return base


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    total_n: int,
    seed: int = 0,
    counts: Mapping[str, int] | None = None,
    validate_counts: bool = False,
) -> DataFrame:
    """Proportional stratified sample with EXACT quotas: the sample has
    exactly ``total_n`` rows, allocated across strata by largest
    remainder (so every stratum's share is within one row of exact
    proportionality — the allocation a mixture contract actually
    specifies, vs the binomial jitter of per-row Bernoulli in
    :func:`stratified_sample`). Within a stratum, membership is the
    top-``quota`` rows by the portable md5 hash (ties by id), so the
    drawn SET is a pure function of (id set, total_n, seed) on any
    engine — a SQL oracle replays it row for row.

    Scale shape: one metadata-cheap count per stratum (driver-side dict,
    bounded by the number of strata), then ONE window partitioned by the
    stratum column — rows shuffle once by stratum; no global sort, no
    second pass. Returns (stratum, rank, id columns...) with
    ``__ss_rank`` 1-based within stratum.

    PRECONDITION on a caller-supplied ``counts``: it must cover every
    stratum present in ``df`` with its ACCURATE row count. Rows whose
    stratum is absent from ``counts`` are silently dropped (the quota
    join is inner), and the "quota never exceeds stratum size" guarantee
    only holds for accurate counts. Pass ``validate_counts=True`` to
    spend one extra counting pass checking both properties."""
    from pyspark.sql import Window

    if counts is None:
        counts = {
            r["s"]: r["c"]
            for r in df.groupBy(F.col(stratum_col).alias("s"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
    elif validate_counts:
        observed = {
            r["s"]: r["c"]
            for r in df.groupBy(F.col(stratum_col).alias("s"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        missing = sorted(set(observed) - set(counts))
        if missing:
            raise ValueError(
                f"counts is missing observed strata {missing[:10]} — their"
                " rows would be silently dropped by the quota join"
            )
        wrong = {
            k: (counts[k], observed[k])
            for k in observed
            if counts[k] != observed[k]
        }
        if wrong:
            raise ValueError(
                "counts disagrees with observed stratum sizes (given,"
                f" observed): {dict(list(wrong.items())[:10])}"
            )
        phantom = sorted(
            k for k in set(counts) - set(observed) if counts[k] != 0
        )
        if phantom:
            raise ValueError(
                f"counts names strata absent from df {phantom[:10]} with"
                " nonzero sizes — they would steal quota from real strata"
                " via allocate_exact and the sample would silently land"
                f" below total_n={total_n}"
            )
    quotas = allocate_exact(sorted(counts.items()), total_n)
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        sorted(quotas.items()), f"{stratum_col} string, __ss_quota long"
    )
    w = Window.partitionBy(stratum_col).orderBy(
        portable_unit_hash32(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn("__ss_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(qdf), stratum_col)
        .where(F.col("__ss_rank") <= F.col("__ss_quota"))
        .drop("__ss_quota")
    )
