"""Gopher repetition filters (operators/gopher.py): hand-computed pins,
a pure-python reference parity sweep, boundary semantics (thresholds are
strict >), and partitioning invariance."""

import random

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.gopher import (
    THRESHOLDS,
    repetition_flags,
    repetition_stats,
)


def _stats_df(spark, docs):
    df = spark.createDataFrame(
        [(i, t.split()) for i, t in enumerate(docs)], "doc_id long, toks array<string>"
    )
    return repetition_stats(df, id_col="doc_id", tokens_col="toks")


def _py_reference(toks, line_width=8, top_ns=(2, 3), dup_ns=(5, 10)):
    """Pure-python recompute of every counter."""
    from collections import Counter

    total_chars = len(" ".join(toks))
    lines = [
        " ".join(toks[c * line_width : (c + 1) * line_width])
        for c in range((len(toks) + line_width - 1) // line_width)
    ]
    lc = Counter(lines)
    out = {
        "total_tokens": len(toks),
        "total_chars": total_chars,
        "total_lines": len(lines),
        "dup_lines": sum(c for c in lc.values() if c > 1),
        "dup_line_chars": sum(
            c * len(line) for line, c in lc.items() if c > 1
        ),
    }
    for n in top_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        out[f"top{n}_cover"] = max(
            (c * len(g) for g, c in grams.items()), default=0
        )
    for n in dup_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        out[f"dup{n}_cover"] = sum(
            c * len(g) for g, c in grams.items() if c > 1
        )
    return out


def test_hand_computed_dup_lines(spark):
    # 16 tokens = two identical 8-token lines -> both occurrences counted
    line = "a b c d e f g h"
    doc = line + " " + line
    row = _stats_df(spark, [doc]).first()
    assert row["total_lines"] == 2
    assert row["dup_lines"] == 2
    assert row["dup_line_chars"] == 2 * len(line)
    assert row["total_chars"] == len(doc)


def test_hand_computed_top_bigram(spark):
    # "x y x y x y": bigrams x_y (3), y_x (2) -> top cover 3*len("x y")=9
    row = _stats_df(spark, ["x y x y x y"]).first()
    assert row["top2_cover"] == 9
    assert row["dup5_cover"] == 0  # 5-grams "x y x y x"(1), "y x y x y"(1)


def test_python_reference_parity(spark):
    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "longword"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        for _ in range(40)
    ]
    docs = [d for d in docs if d.strip()]
    got = {
        r["id"]: r.asDict()
        for r in _stats_df(spark, docs).collect()
    }
    for i, d in enumerate(docs):
        ref = _py_reference(d.split())
        for k, v in ref.items():
            assert got[i][k] == v, (i, k, got[i][k], v, d)


def test_threshold_strictly_greater(spark):
    # dup_line_frac exactly 0.30 must NOT fail (Gopher removes only >):
    # 10 lines, 3 duplicates -> 10*3 > 3*10 is False.
    line = "p q r s t u v w"
    uniq = [f"u{i} " * 8 for i in range(7)]
    doc = " ".join([line, line, line] + uniq)
    flags = repetition_flags(_stats_df(spark, [doc])).first()
    assert flags["total_lines"] == 10 and flags["dup_lines"] == 3
    assert not flags["fail_dup_line"]
    assert set(THRESHOLDS) == {
        "dup_line_frac", "dup_line_char_frac", "top2_char_frac",
        "top3_char_frac", "dup5_char_frac", "dup10_char_frac",
    }


def test_partitioning_invariance(spark):
    rng = random.Random(11)
    vocab = ["k", "vv", "www"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40)))
        for _ in range(30)
    ]
    df1 = spark.createDataFrame(
        [(i, t.split()) for i, t in enumerate(docs)],
        "doc_id long, toks array<string>",
    )
    a = {r["id"]: r.asDict() for r in repetition_stats(df1).collect()}
    b = {
        r["id"]: r.asDict()
        for r in repetition_stats(df1.repartition(13)).collect()
    }
    assert a == b


def test_empty_tokens_row_survives(spark):
    df = spark.createDataFrame(
        [(0, []), (1, ["a", "b"])], "doc_id long, toks array<string>"
    )
    rows = {r["id"]: r for r in repetition_stats(df).collect()}
    assert rows[0]["total_lines"] == 0 and rows[0]["dup_lines"] == 0
    assert rows[0]["total_chars"] == 0
    flags = {
        r["id"]: r
        for r in repetition_flags(repetition_stats(df)).collect()
    }
    assert not any(
        flags[0][c] for c in flags[0].asDict() if c.startswith("fail_")
    )
