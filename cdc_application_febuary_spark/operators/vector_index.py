"""Persisted IVF vector index: the ANN index as a manifest-committed table.

`similarity.ivf_topk` re-trains and re-assigns per query run; a production
corpus builds the index ONCE and serves many searches. This module persists
the inverted file as a transactional table and makes search an I/O-pruned
read:

* **build**: train spherical k-means centroids on a bounded sample
  (`similarity._kmeans_sample` — driver holds MBs regardless of corpus
  size), assign every vector its cluster Arrow-batched, then commit the
  corpus **range-clustered by cluster id** as a manifest table whose
  per-file key stats are cluster ranges. Centroids ride in the commit
  metadata (n_centroids x dim floats — KBs), so the index is
  self-describing and versioned with its data.
* **search**: nearest `n_probe` centroids per query come from the stored
  centroid matrix; the candidate read opens ONLY the files whose cluster
  envelope overlaps a probed cluster (`manifest_table` file pruning — the
  same stats that plan the MERGE prune the search), then scores exactly
  within candidates. Search cost ~ n_probe/n_centroids of the corpus in
  FILES OPENED, not just rows scanned.
* index rebuilds are snapshot-isolated: searches against version N are
  unaffected by a concurrent rebuild committing N+1, and `read_table(
  version=N)` time-travels old indexes.

``n_probe >= n_centroids`` degenerates to exact brute force — pinned by
tests against `similarity.cosine_topk`.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import manifest_table as mt
from .similarity import (
    _assign_cluster_udf,
    _kmeans_sample,
    cosine_pairs,
)


def build_ivf_index(
    corpus: DataFrame,
    table_path: str,
    n_centroids: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train: int = 4096,
    files_per_cluster_group: int = 1,
) -> dict:
    """Build (or rebuild) the index at ``table_path``. Returns commit stats.

    The corpus lands range-partitioned by cluster id so each file covers a
    compact cluster range; raising ``files_per_cluster_group`` produces
    more, smaller files and therefore finer search-time pruning (the usual
    file-count vs pruning-granularity trade)."""
    # deterministic sample order (orderBy + limit = TakeOrderedAndProject):
    # a bare limit() shifts with input partitioning and would silently
    # retrain different centroids on repartitioned input (the
    # semantic_dedup trap pinned in CLAUDE.md / tests/test_semdedup.py)
    sample_rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(max_train)
        .collect()
    )
    centers = np.asarray(
        _kmeans_sample([r["v"] for r in sample_rows], n_centroids, iters, seed),
        dtype="float64",
    )
    assign = _assign_cluster_udf(centers)
    # persist: repartitionByRange pays a range-boundary sampling pass over
    # its child BEFORE the shuffle write — unpersisted, the Arrow
    # assignment UDF (the expensive part of a commit) would run twice per
    # build (r10 optimization; same in append/PQ build below)
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        assign(F.col(vec_col)).alias("cluster"),
    ).persist()
    n_files = max(1, n_centroids * files_per_cluster_group // 4)
    packed = assigned.repartitionByRange(n_files, "cluster")
    spark = corpus.sparkSession
    base = mt.current_version(spark, table_path)
    entries = mt._stage_files(packed, table_path, ["cluster"])
    assigned.unpersist()
    mt._write_manifest_atomic(
        spark,
        table_path,
        0 if base is None else base + 1,
        entries,
        meta={
            "index": "ivf",
            "n_centroids": int(n_centroids),
            "dim": int(centers.shape[1]),
            "centroids": [[float(x) for x in row] for row in centers],
        },
    )
    return {
        "version": 0 if base is None else base + 1,
        "n_files": len(entries),
        "n_centroids": n_centroids,
        # exact staged row count from the commit's own file entries — the
        # manifest-is-the-truth count (mt.table_rows), free to callers that
        # would otherwise re-scan the corpus just to report its size
        "rows": sum(e.rows for e in entries),
    }


def _load_centroids(spark: SparkSession, table_path: str, version: int):
    meta = mt.read_commit_meta(spark, table_path, version)
    if meta.get("index") != "ivf":
        raise ValueError(f"{table_path} v{version} is not an IVF index")
    return np.asarray(meta["centroids"], dtype="float64")


def append_ivf_index(
    batch: DataFrame,
    table_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
    files_per_cluster_group: int = 1,
) -> dict | None:
    """Add a vector batch to an existing index WITHOUT retraining — the
    faiss ``add()`` analog, versioned: assign the batch to the index's
    frozen centroids (commit-meta matrix, Arrow-batched argmax), stage it
    range-clustered by cluster id, and commit old entries + new entries
    as the next version carrying the same centroids. Search needs no
    changes: pruning sees the union of file envelopes, snapshot isolation
    keeps in-flight searches on the prior version, and a rebuild later
    re-clusters everything.

    ``batch_id`` (optional) makes ingestion exactly-once under streaming
    replay: a batch id at or below the last committed one returns None
    and commits nothing (manifest-sink semantics). The commit meta tracks
    ``appended_rows`` cumulatively — the re-cluster dial: appended mass
    was assigned to frozen centroids, so once it rivals the trained base,
    rebuild for balanced cells.

    Returns commit stats, or None for a replayed batch."""
    spark = batch.sparkSession
    version = mt.current_version(spark, table_path)
    if version is None:
        raise FileNotFoundError(f"no committed index at {table_path}")
    meta = mt.read_commit_meta(spark, table_path, version)
    if meta.get("index") != "ivf":
        raise ValueError(f"{table_path} v{version} is not an IVF index")
    if batch_id is not None:
        seen = meta.get("batch_id")
        if seen is not None and int(batch_id) <= int(seen):
            return None
    centers = np.asarray(meta["centroids"], dtype="float64")
    sample = batch.select(F.col(vec_col)).first()
    if sample is not None and len(sample[0]) != centers.shape[1]:
        raise ValueError(
            f"batch dim {len(sample[0])} != index dim {centers.shape[1]}"
        )
    assign = _assign_cluster_udf(centers)
    assigned = batch.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        assign(F.col(vec_col)).alias("cluster"),
    ).persist()  # one Arrow assignment pass, not two (see build_ivf_index)
    n_files = max(
        1, int(meta["n_centroids"]) * files_per_cluster_group // 4
    )
    packed = assigned.repartitionByRange(n_files, "cluster")
    new_entries = mt._stage_files(packed, table_path, ["cluster"])
    assigned.unpersist()
    old_entries = mt._read_manifest(spark, table_path, version)
    appended = sum(e.rows for e in new_entries)
    # Carry the stored batch_id forward on an unkeyed append: dropping it
    # would erase the exactly-once watermark, letting a later replay of an
    # already-committed batch id pass the `seen is None` check and land
    # duplicate vectors (ADVICE r3). Only a new keyed append overwrites it.
    new_meta = {
        **meta,
        "appended_rows": int(meta.get("appended_rows", 0)) + int(appended),
    }
    if batch_id is not None:
        new_meta["batch_id"] = int(batch_id)
    mt._write_manifest_atomic(
        spark, table_path, version + 1, old_entries + new_entries,
        meta=new_meta,
    )
    return {
        "version": version + 1,
        "new_files": len(new_entries),
        "appended_rows": int(appended),
        "total_appended_rows": new_meta["appended_rows"],
    }


def search_ivf_index(
    spark: SparkSession,
    table_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    version: int | None = None,
) -> dict:
    """Stats-pruned IVF search. Returns {"result": DataFrame,
    "files_total": N, "files_opened": M} so callers (and tests) can see the
    I/O pruning, not just the answer.

    The probed cluster set is the union over the query batch (queries are
    bounded — the brute-force tier's assumption); candidate files are those
    whose [cluster_min, cluster_max] envelope intersects it."""
    if version is None:
        version = mt.current_version(spark, table_path)
    if version is None:
        raise FileNotFoundError(f"no committed index at {table_path}")
    centers = _load_centroids(spark, table_path, version)

    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).collect()
    if not q_rows:
        raise ValueError("empty query set")
    Q = np.vstack([np.asarray(r["qvec"], dtype="float64") for r in q_rows])
    norms = np.linalg.norm(Q, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (Q / norms) @ centers.T
    order = np.argsort(-sims, kind="stable", axis=1)[:, :n_probe]
    probed_per_query = [
        (r["query_id"], r["qvec"], [int(c) for c in row])
        for r, row in zip(q_rows, order)
    ]
    probe_set = sorted({c for _, _, row in probed_per_query for c in row})

    entries = mt._read_manifest(spark, table_path, version)
    candidates = [
        e
        for e in entries
        if any(
            e.key_min.get("cluster") <= c <= e.key_max.get("cluster")
            for c in probe_set
        )
    ]
    if not candidates:
        empty = spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, sim double"
        )
        return {"result": empty, "files_total": len(entries), "files_opened": 0}

    # Blocked scoring (r10, guide §4/§8): the old shape joined the
    # candidate rows against a per-(query, probed-cluster) broadcast and
    # shipped BOTH 64-dim vectors of every surviving pair through Arrow to
    # `cosine_pairs` — queries x candidates duplicated vector payloads.
    # Now the query matrix rides to executors once as a closure broadcast
    # and each corpus partition is scored in one mapInPandas pass with the
    # per-pair arithmetic kept BIT-IDENTICAL to cosine_pairs (same einsum
    # signature, same float64 casts, same norm/divide order), so results
    # cannot move. Per-partition top-k is selected under the same
    # (sim desc, id asc) order as the global window, so the union of
    # partition winners provably contains the global top-k (the
    # cosine_topk_blocked argument; like that tier it assumes no zero-norm
    # vectors — the fixture-wide invariant its parity tests pin).
    qids = np.asarray([r["query_id"] for r in q_rows], dtype="int64")
    qnorm = np.linalg.norm(Q, axis=1)
    probe_sets = [
        np.asarray(row, dtype="int64") for _, _, row in probed_per_query
    ]
    kk = int(k)

    def score_blocks(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            cl = pdf["cluster"].to_numpy()
            M = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
            cn = np.linalg.norm(M, axis=1)
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                mask = np.isin(cl, probe_sets[j]) & (ids != qids[j])
                if not mask.any():
                    continue
                sub = M[mask]
                num = np.einsum(
                    "ij,ij->i", np.broadcast_to(Q[j], sub.shape), sub
                )
                s = num / (qnorm[j] * cn[mask])
                sel = np.lexsort((ids[mask], -s))[: min(kk, len(s))]
                out_q.extend([qids[j]] * len(sel))
                out_n.extend(ids[mask][sel])
                out_s.extend(s[sel])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim0": out_s}
            )

    corpus = spark.read.parquet(*[e.path for e in candidates])
    partial = corpus.select("vec_id", "cluster", "embedding").mapInPandas(
        score_blocks, "query_id long, neighbor_id long, sim0 double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim0").desc(), F.col("neighbor_id").asc()
    )
    result = (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("sim0"), 6).alias("sim"),
        )
    )
    return {
        "result": result,
        "files_total": len(entries),
        "files_opened": len(candidates),
    }


def build_ivf_pq_index(
    corpus: DataFrame,
    table_path: str,
    n_centroids: int = 16,
    pq_m: int = 8,
    pq_k: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train: int = 4096,
) -> dict:
    """IVF+PQ: the production 100 TB ANN layout — coarse cluster routing
    (IVF) over 8-byte PQ codes, with the full vector retained per row for
    optional exact rerank. One training sample feeds BOTH quantizers;
    cluster assignment and PQ encoding run as Arrow passes; the table
    commits range-clustered by cluster id with centroids AND codebooks in
    the commit metadata (self-describing, versioned with the data). The
    ADC scan reads (vec_id, cluster, codes) ONLY — column pruning keeps
    the big embedding column on disk unless a rerank asks for it."""
    from .pq import _encode_codes_udf, train_pq_matrix

    # deterministic sample order (orderBy + limit = TakeOrderedAndProject):
    # a bare limit() shifts with input partitioning and would silently
    # retrain different centroids on repartitioned input (the
    # semantic_dedup trap pinned in CLAUDE.md / tests/test_semdedup.py)
    sample_rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(max_train)
        .collect()
    )
    sample = np.asarray([r["v"] for r in sample_rows], dtype="float64")
    centers = np.asarray(
        _kmeans_sample([r["v"] for r in sample_rows], n_centroids, iters, seed),
        dtype="float64",
    )
    codebooks = train_pq_matrix(sample, pq_m, pq_k, iters=8, seed=seed)

    # ONE Arrow pass (r10): cluster assignment and PQ codes are sibling
    # pandas UDFs in the same projection (one ArrowEvalPython node), so
    # the corpus is scanned once and never shuffled through the old
    # assigned-join-codes equi-join; persist keeps repartitionByRange's
    # range-sampling pass from re-running the Python work (see
    # build_ivf_index). Codes/cluster values are bit-identical — both
    # UDFs are unchanged arithmetic per row.
    assign = _assign_cluster_udf(centers)
    encode = _encode_codes_udf(codebooks)
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        assign(F.col(vec_col)).alias("cluster"),
        encode(F.col(vec_col)).alias("codes"),
    ).persist()
    packed = assigned.repartitionByRange(max(1, n_centroids // 4), "cluster")
    spark = corpus.sparkSession
    base = mt.current_version(spark, table_path)
    entries = mt._stage_files(packed, table_path, ["cluster"])
    assigned.unpersist()
    mt._write_manifest_atomic(
        spark,
        table_path,
        0 if base is None else base + 1,
        entries,
        meta={
            "index": "ivf_pq",
            "n_centroids": int(n_centroids),
            "pq_m": int(pq_m),
            "pq_k": int(pq_k),
            "dim": int(centers.shape[1]),
            "centroids": [[float(x) for x in row] for row in centers],
            "codebooks": [
                [[float(x) for x in c] for c in sub] for sub in codebooks
            ],
        },
    )
    return {
        "version": 0 if base is None else base + 1,
        "n_files": len(entries),
        "n_centroids": n_centroids,
        "code_bytes_per_vector": pq_m,
    }


def search_ivf_pq(
    spark: SparkSession,
    table_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    version: int | None = None,
    rerank: int = 0,
) -> dict:
    """ADC search over the IVF-PQ index: probe clusters by centroid
    similarity, score candidates by pure-JVM lookup-table sums over their
    8-byte codes — the scan never deserializes the embedding column
    (asserted by tests via ReadSchema). ``rerank=R`` re-scores each
    query's top R ADC hits with exact cosine (a second, id-pruned read
    that DOES touch embeddings) — the standard accuracy dial.

    Returns {"result", "files_total", "files_opened"}; result is
    (query_id, neighbor_id, rank, adc_dist[, sim]) ascending by distance."""
    if version is None:
        version = mt.current_version(spark, table_path)
    if version is None:
        raise FileNotFoundError(f"no committed index at {table_path}")
    meta = mt.read_commit_meta(spark, table_path, version)
    if meta.get("index") != "ivf_pq":
        raise ValueError(f"{table_path} v{version} is not an IVF-PQ index")
    centers = np.asarray(meta["centroids"], dtype="float64")
    codebooks = np.asarray(meta["codebooks"], dtype="float64")
    from .pq import adc_lut

    pq_m, pq_k = int(meta["pq_m"]), int(meta["pq_k"])

    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).collect()
    if not q_rows:
        raise ValueError("empty query set")
    Q = np.vstack([np.asarray(r["qvec"], dtype="float64") for r in q_rows])
    norms = np.linalg.norm(Q, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (Q / norms) @ centers.T
    order = np.argsort(-sims, kind="stable", axis=1)[:, :n_probe]
    probed = [
        (
            int(r["query_id"]),
            [float(x) for x in adc_lut(codebooks, np.asarray(r["qvec"])).ravel()],
            [int(c) for c in row],
        )
        for r, row in zip(q_rows, order)
    ]
    probe_set = sorted({c for _, _, row in probed for c in row})

    entries = mt._read_manifest(spark, table_path, version)
    candidates = [
        e
        for e in entries
        if any(
            e.key_min.get("cluster") <= c <= e.key_max.get("cluster")
            for c in probe_set
        )
    ]
    if not candidates:
        empty = spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, adc_dist double"
        )
        return {"result": empty, "files_total": len(entries), "files_opened": 0}

    # Blocked ADC scoring (r11, guide §4.2/§8 — the §14/search_ivf_index
    # treatment): the old shape exploded (query, probed-cluster) rows,
    # broadcast-joined them against every candidate code row — shipping
    # the 128-double LUT payload per surviving PAIR — and evaluated the
    # ADC sum as an interpreted zip_with/aggregate HOF per pair. Now the
    # per-query LUTs + probed sets ride to executors once in the
    # mapInPandas closure and each candidate partition is scored in one
    # numpy pass. The per-pair arithmetic is BIT-IDENTICAL: the fold
    # accumulates lut[i*k + code_i] left-to-right from 0.0 over
    # i = 0..m-1 exactly as the old aggregate() lambda did (sequential
    # float64 additions in the same order), so distances cannot move.
    # Per-partition top-max(k, rerank) is selected under the same
    # (adc_dist asc, vec_id asc) order as the global window, so the union
    # of partition winners provably contains the global top rows (the
    # cosine_topk_blocked containment argument).
    qids = np.asarray([q for q, _, _ in probed], dtype="int64")
    luts = [
        np.asarray(lut, dtype="float64").reshape(pq_m, pq_k)
        for _, lut, _ in probed
    ]
    probe_sets = [np.asarray(row, dtype="int64") for _, _, row in probed]
    topn = max(int(k), int(rerank))
    mm = int(pq_m)

    def adc_blocks(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            cl = pdf["cluster"].to_numpy()
            C = np.vstack(pdf["codes"].to_numpy()).astype("int64")
            out_q, out_n, out_d = [], [], []
            for j in range(len(qids)):
                mask = np.isin(cl, probe_sets[j]) & (ids != qids[j])
                if not mask.any():
                    continue
                sub = C[mask]
                # sequential left-fold, same addition order as the old
                # aggregate(zip_with(...)) expression: acc starts 0.0 and
                # adds term i = lut[i, code_i] for i = 0..m-1 in order
                acc = np.zeros(len(sub), dtype="float64")
                lut_j = luts[j]
                for i in range(mm):
                    acc = acc + lut_j[i, sub[:, i]]
                sel = np.lexsort((ids[mask], acc))[: min(topn, len(acc))]
                out_q.append(np.full(len(sel), qids[j], dtype="int64"))
                out_n.append(ids[mask][sel])
                out_d.append(acc[sel])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "adc0": np.concatenate(out_d),
                    }
                )

    # the ADC scan projects ONLY (vec_id, cluster, codes): embeddings
    # stay on disk
    code_side = spark.read.parquet(*[e.path for e in candidates]).select(
        "vec_id", "cluster", "codes"
    )
    partial = code_side.mapInPandas(
        adc_blocks, "query_id long, neighbor_id long, adc0 double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc0").asc(), F.col("neighbor_id").asc()
    )
    top = (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= max(k, rerank))
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("adc0"), 6).alias("adc_dist"),
        )
    )
    if rerank:
        qvecs = spark.createDataFrame(
            [(int(r["query_id"]), [float(x) for x in r["qvec"]]) for r in q_rows],
            "query_id long, qvec array<double>",
        )
        emb_side = spark.read.parquet(*[e.path for e in candidates]).select(
            F.col("vec_id").alias("neighbor_id"), "embedding"
        )
        # broadcast the decision side (ids + ranks, ~28 B/row) so the
        # embedding payload read is never shuffled by the attach join —
        # guide §8's "move big rows once" rule; join strategy cannot
        # change values
        rr = (
            emb_side.join(F.broadcast(top), "neighbor_id")
            .join(F.broadcast(qvecs), "query_id")
            .withColumn("sim", cosine_pairs(F.col("qvec"), F.col("embedding")))
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
        top = (
            rr.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                "rank",
                "adc_dist",
                F.round(F.col("sim"), 6).alias("sim"),
            )
        )
    return {
        "result": top,
        "files_total": len(entries),
        "files_opened": len(candidates),
    }
