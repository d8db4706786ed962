"""Cross-corpus line dedup (operators/linededup.py): keeper-ownership
semantics, normalization collapses spellings, within-doc duplicates,
zero-line docs, and the drop-threshold boundary."""

from cdc_application_febuary_spark.operators.linededup import (
    line_corpus_dedup,
)


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [(i, lines) for i, lines in enumerate(docs)],
        "doc_id long, lines array<string>",
    )
    return {
        r["id"]: r.asDict() for r in line_corpus_dedup(df, **kw).collect()
    }


def test_keeper_is_lowest_doc(spark):
    rows = _run(
        spark,
        [
            ["alpha beta.", "unique zero."],
            ["alpha beta.", "unique one."],
            ["alpha beta."],
        ],
    )
    assert rows[0] == {
        "id": 0,
        "n_lines": 2,
        "kept_lines": 2,
        "dup_lines": 0,
        "doc_dropped": False,
    }
    assert rows[1]["kept_lines"] == 1 and rows[1]["dup_lines"] == 1
    # doc 2's only line is owned by doc 0: 100% duplicates -> dropped
    assert rows[2]["kept_lines"] == 0 and rows[2]["dup_lines"] == 1
    assert rows[2]["doc_dropped"] is True


def test_normalization_collapses_spellings(spark):
    rows = _run(
        spark,
        [["Footer  All  Rights."], ["  footer all rights. "]],
    )
    assert rows[0]["kept_lines"] == 1
    assert rows[1]["kept_lines"] == 0 and rows[1]["dup_lines"] == 1


def test_within_doc_duplicates_count_once(spark):
    rows = _run(spark, [["same line here.", "same line here.", "other."]])
    r = rows[0]
    # one keeper occurrence per distinct line, the repeat is a dup
    assert r["n_lines"] == 3 and r["kept_lines"] == 2 and r["dup_lines"] == 1


def test_zero_line_docs_surface(spark):
    rows = _run(spark, [[], ["real line."]])
    assert rows[0] == {
        "id": 0,
        "n_lines": 0,
        "kept_lines": 0,
        "dup_lines": 0,
        "doc_dropped": False,
    }


def test_drop_threshold_boundary_is_strict(spark):
    # 10 lines, 3 dups: 3*100 == 10*30 -> NOT dropped (strictly greater)
    shared = [f"shared line {i}." for i in range(3)]
    uniq0 = [f"uniq zero {i}." for i in range(7)]
    uniq1 = [f"uniq one {i}." for i in range(7)]
    rows = _run(spark, [shared + uniq0, shared + uniq1])
    assert rows[1]["dup_lines"] == 3 and rows[1]["doc_dropped"] is False
    # 4 dups of 10: 400 > 300 -> dropped
    rows = _run(
        spark,
        [
            [f"s{i}." for i in range(4)] + [f"z{i}." for i in range(6)],
            [f"s{i}." for i in range(4)] + [f"o{i}." for i in range(6)],
        ],
    )
    assert rows[1]["dup_lines"] == 4 and rows[1]["doc_dropped"] is True


def test_boilerplate_max_df_drops_hot_keys_everywhere(spark):
    docs = [["footer line here.", f"uniq{i} a."] for i in range(5)]
    rows = _run(spark, docs, boilerplate_max_df=3)
    # footer appears in 5 docs > cap 3: dropped everywhere, even doc 0
    assert all(r["kept_lines"] == 1 for r in rows.values())
    assert all(r["dup_lines"] == 1 for r in rows.values())
    # below the cap the keep-one semantics are unchanged
    rows = _run(spark, docs, boilerplate_max_df=5)
    assert rows[0]["kept_lines"] == 2
    assert sum(r["kept_lines"] for r in rows.values()) == 6


def test_incremental_batch_replay_noops(spark, tmp_path):
    from cdc_application_febuary_spark.operators.linededup import (
        line_dedup_batch,
    )
    from cdc_application_febuary_spark.sources import manifest_table as mt

    store = str(tmp_path / "lines")

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, lines array<string>"
        )

    b0 = mk([(0, ["shared footer line.", "only in zero."])])
    b1 = mk([(1, ["shared footer line.", "novel in one."])])
    r0 = line_dedup_batch(b0, store, 0)
    assert {t["id"]: t["kept_lines"] for t in r0.collect()} == {0: 2}
    r0.unpersist()
    r1 = line_dedup_batch(b1, store, 1)
    rows1 = {t["id"]: t.asDict() for t in r1.collect()}
    # footer already in the store: dup; the novel line is kept
    assert rows1[1]["kept_lines"] == 1 and rows1[1]["dup_lines"] == 1
    r1.unpersist()
    assert mt.read_table(spark, store).count() == 3
    # crash replay: same batch id must no-op and leave the store intact
    assert line_dedup_batch(b1, store, 1) is None
    assert mt.read_table(spark, store).count() == 3
