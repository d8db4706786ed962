"""Document chunking: window math, overlap, offsets, edge cases."""

import pytest

from cdc_application_febuary_spark.operators import chunking


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_text_with_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    out = chunking.chunk_by_words(
        _docs(spark, [(1, " ".join(words))]), chunk_size=4, overlap=1
    ).collect()
    got = {(r["start_word"]): r["chunk_text"] for r in out}
    # step 3: starts 0,3,6,9
    assert got[0] == "w0 w1 w2 w3"
    assert got[3] == "w3 w4 w5 w6"
    assert got[6] == "w6 w7 w8 w9"
    assert got[9] == "w9"  # short trailing chunk
    assert len(got) == 4
    # every word appears in at least one chunk
    covered = set()
    for t in got.values():
        covered |= set(t.split())
    assert covered == set(words)


def test_short_doc_single_chunk(spark):
    out = chunking.chunk_by_words(
        _docs(spark, [(1, "a b c")]), chunk_size=32, overlap=8
    ).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "a b c"
    assert out[0]["n_chunk_words"] == 3
    assert out[0]["start_word"] == 0


def test_blank_docs_produce_no_chunks(spark):
    out = chunking.chunk_by_words(
        _docs(spark, [(1, "   "), (2, "x y")]), chunk_size=4, overlap=0
    ).collect()
    assert len(out) == 1 and out[0]["id"] == 2


def test_bad_overlap_rejected(spark):
    with pytest.raises(ValueError):
        chunking.chunk_by_words(_docs(spark, [(1, "a")]), 8, 8)
