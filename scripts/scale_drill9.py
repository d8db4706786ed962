#!/usr/bin/env python
"""Decade datapoint for the round-8 additions: rerank_cross_encoder,
scd2_time_travel_snapshots, and stream_session_eviction at 1x and 10x the
sf0.1 tables.

The 10x corpora are REPLICATED (ids offset per replica, payloads and
timestamps unchanged), giving each operator a falsifiable 10x contract:

* time travel — spans replicate per user copy, so every
  (snap_date, event_type) cell must satisfy EXACT integer identities:
  n_users' = 10*n, sum_event_id' = 10*sum + 45*max_eid_offset*n,
  min_user' = min, max_user' = max + 9*max_uid_offset.
* sessions — session boundaries are per-user, so the 10x output must be
  exactly ten translated copies of the 1x session set (canonicalized by
  user_id mod offset) and 10x the row count; the streaming state grows
  with ACTIVE users, which is the cost being measured.
* rerank — every 10x cosine and interaction score derives from the 1x
  vectors, so for a deterministic sample of replica-0 queries the full
  two-stage result (top-20 by (cos desc, id asc) over the replicated
  corpus incl. exact-duplicate query copies, then weighted fixed-point
  rerank) must match a numpy replay bit for bit.

Usage: python scripts/scale_drill9.py   (run alone; timings are the point)
Writes SCALE_DRILL9.json.
"""

import json
import sys
import time
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_drill9"
R = 10


def main() -> None:
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.catalog import load_events_raw, load_table
    from cdc_application_febuary_spark.queries.pipeline_ops import (
        QUERIES as PQ,
    )
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="scale-drill9")
    spark.sparkContext.setLogLevel("ERROR")
    ten = f"{WORK}/x10"
    reps = spark.range(R).select(F.col("id").alias("__r"))

    ev = load_events_raw(spark, SRC)
    maxu = ev.agg(F.max("user_id")).first()[0] + 1
    maxe = ev.agg(F.max("event_id")).first()[0] + 1
    ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("__r") * maxe).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__r") * maxu).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(f"{ten}/events.parquet")

    emb = load_table(spark, SRC, "embeddings")
    maxv = emb.agg(F.max("vec_id")).first()[0] + 1
    if maxv % 10 != 0:
        raise RuntimeError("drill assumes the id span is a multiple of 10")
    emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("__r") * maxv).alias("vec_id"), "embedding"
    ).write.mode("overwrite").parquet(f"{ten}/embeddings.parquet")

    results = {}

    def timed(name, sf):
        t0 = time.time()
        rows = PQ[name](spark, sf).collect()
        return rows, round(time.time() - t0, 2)

    # ---- scd2_time_travel_snapshots -----------------------------------
    r1, s1 = timed("scd2_time_travel_snapshots", SRC)
    r10, s10 = timed("scd2_time_travel_snapshots", ten)
    base = {(r["snap_date"], r["event_type"]): r for r in r1}
    big = {(r["snap_date"], r["event_type"]): r for r in r10}
    tt_ok = set(base) == set(big) and all(
        big[k]["n_users"] == 10 * v["n_users"]
        and big[k]["sum_event_id"]
        == 10 * v["sum_event_id"] + 45 * maxe * v["n_users"]
        and big[k]["min_user"] == v["min_user"]
        and big[k]["max_user"] == v["max_user"] + 9 * maxu
        for k, v in base.items()
    )
    results["scd2_time_travel_snapshots"] = {
        "sec_1x": s1, "sec_10x": s10, "ratio": round(s10 / s1, 2),
        "rows_1x": len(r1), "rows_10x": len(r10),
        "integer_identities_exact": bool(tt_ok),
    }
    print(results["scd2_time_travel_snapshots"], flush=True)

    # ---- stream_session_eviction --------------------------------------
    r1, s1 = timed("stream_session_eviction", SRC)
    r10, s10 = timed("stream_session_eviction", ten)
    canon1 = Counter(
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"]) for r in r1
    )
    canon10 = Counter(
        (r["user_id"] % maxu, r["start_us"], r["end_us"], r["n_events"])
        for r in r10
    )
    sess_ok = len(r10) == 10 * len(r1) and canon10 == Counter(
        {k: 10 * v for k, v in canon1.items()}
    )
    results["stream_session_eviction"] = {
        "sec_1x": s1, "sec_10x": s10, "ratio": round(s10 / s1, 2),
        "rows_1x": len(r1), "rows_10x": len(r10),
        "ten_translated_copies_exact": bool(sess_ok),
    }
    print(results["stream_session_eviction"], flush=True)

    # ---- rerank_cross_encoder ------------------------------------------
    r1, s1 = timed("rerank_cross_encoder", SRC)
    r10, s10 = timed("rerank_cross_encoder", ten)
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype="float64")
        for r in emb.collect()
    }
    M = np.vstack([vecs[i] for i in range(len(vecs))])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Q = np.floor(M * 4096).astype("int64")
    wdim = (np.arange(M.shape[1], dtype="int64") * 2654435761) % 97 - 48

    def replay(qid):
        # replicated corpus: id' = orig + r*maxv, identical vectors
        sims = Mn @ Mn[qid]
        ids = np.arange(len(vecs) * R, dtype="int64")
        orig = ids % maxv
        cand_sims = sims[orig]
        mask = ids != qid  # exclude only the query row itself
        order = np.lexsort((ids[mask], -cand_sims[mask]))
        top = ids[mask][order[:20]]
        scores = (Q[top % maxv] * Q[qid] * wdim).sum(axis=1)
        o2 = np.lexsort((top, -scores))
        sel = o2[:5]
        return [
            (qid, int(top[i]), rank + 1, int(scores[i]))
            for rank, i in enumerate(sel)
        ]

    by_q = {}
    for r in r10:
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["query_id"]), int(r["neighbor_id"]), int(r["rerank"]),
             int(r["score"]))
        )
    sample = [i * 100 for i in range(20) if i * 100 < maxv]
    rr_ok = len(r10) == 10 * len(r1) and all(
        sorted(by_q.get(q, [])) == sorted(replay(q)) for q in sample
    )
    results["rerank_cross_encoder"] = {
        "sec_1x": s1, "sec_10x": s10, "ratio": round(s10 / s1, 2),
        "rows_1x": len(r1), "rows_10x": len(r10),
        "numpy_replay_bit_exact_20q": bool(rr_ok),
    }
    print(results["rerank_cross_encoder"], flush=True)

    out = {"replicas": R, "src": SRC, "results": results}
    Path("SCALE_DRILL9.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
