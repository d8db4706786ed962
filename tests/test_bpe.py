"""BPE tokenizer: hand-computed merges, roundtrip, distributed equality."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions import bpe


def test_hand_computed_merge_sequence():
    # corpus: low x5, lower x2, newest x6, widest x3  (Sennrich's example)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_bpe(freqs, 4)
    # 'es' occurs 9x (newest+widest) — most frequent pair first, then
    # 'es'+'t' 9x, then 'est'+'</w>' 9x, then 'l'+'o' 7x
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]


def test_tie_breaks_deterministic():
    freqs = {"ab": 2, "cd": 2}
    merges = bpe.train_bpe(freqs, 1)
    assert merges[0] == ("a", "b")  # lexicographically smallest of the tied


def test_encode_word_roundtrip():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ranks = {p: i for i, p in enumerate(bpe.train_bpe(freqs, 10))}
    for w in ("low", "lower", "newest", "widest", "lowest", "unseen"):
        toks = bpe.bpe_encode_word(w, ranks)
        assert "".join(toks) == w + bpe.END  # lossless
    # trained words compress below characters
    assert len(bpe.bpe_encode_word("newest", ranks)) < len("newest") + 1


def test_more_merges_never_increase_token_count():
    freqs = {"banana": 4, "bandana": 3, "ananas": 2}
    for w in freqs:
        prev = None
        for n in (0, 2, 4, 8, 16):
            ranks = {p: i for i, p in enumerate(bpe.train_bpe(freqs, n))}
            cnt = len(bpe.bpe_encode_word(w, ranks))
            if prev is not None:
                assert cnt <= prev
            prev = cnt


def test_distributed_count_matches_local(spark):
    rows = [(i, f"the cat sat on the mat {i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.train_bpe_on_corpus(docs, n_merges=20)
    cnt = bpe.bpe_token_count_udf(merges)
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", cnt("text").alias("n")).collect()
    }
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for i, text in rows:
        expect = sum(
            len(bpe.bpe_encode_word(w, ranks))
            for w in text.strip().lower().split()
        )
        assert got[i] == expect


def test_tokenize_udf_concatenates_back(spark):
    docs = spark.createDataFrame(
        [(1, "hello world hello")], "doc_id long, text string"
    )
    merges = bpe.train_bpe_on_corpus(docs, n_merges=5)
    toks = bpe.bpe_tokenize_udf(merges)
    arr = docs.select(toks("text").alias("t")).first()["t"]
    assert "".join(arr).replace(bpe.END, " ").strip() == "hello world hello"


def test_corpus_training_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i % 5}") for i in range(50)],
        "doc_id long, text string",
    )
    a = bpe.train_bpe_on_corpus(docs.repartition(3), n_merges=15)
    b = bpe.train_bpe_on_corpus(docs.repartition(11), n_merges=15)
    assert a == b


def test_sequential_encoder_equals_training_segmentation():
    """bpe_encode_word_sequential must reproduce the segmentation the
    training loop itself produced (subword-nmt semantics), including
    same-symbol runs."""
    from cdc_application_febuary_spark.functions.bpe import (
        END,
        bpe_encode_word_sequential,
        train_bpe,
    )

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 4}
    merges = train_bpe(freqs, 10)
    # replaying training: encode each training word and re-count pair
    # stats — the encoded vocab under all merges must contain no
    # mergeable pair from the learned list
    learned = set(merges)
    for w in freqs:
        syms = bpe_encode_word_sequential(w, merges)
        assert "".join(syms) == w + END
        for p in zip(syms, syms[1:]):
            assert p not in learned
    # same-symbol run: [a,a,a,a] under (a,a) -> [aa,aa]
    assert bpe_encode_word_sequential("aaaa", [("a", "a")]) == [
        "aa",
        "aa",
        END,
    ]
