"""C4 cleaning rules (operators/c4.py): hand-computed pins, the
first-violated-rule partition property, and doc-rule boundaries."""

from cdc_application_febuary_spark.operators.c4 import c4_line_filter


def _run(spark, docs):
    df = spark.createDataFrame(
        [(i, lines) for i, lines in enumerate(docs)],
        "doc_id long, lines array<string>",
    )
    return {r["id"]: r.asDict() for r in c4_line_filter(df).collect()}


def test_line_rules_hand_computed(spark):
    rows = _run(
        spark,
        [
            [
                "this line has five words.",     # kept
                "this line has no punct",        # drop_punct
                "too short.",                     # drop_short
                "uses some fancy JavaScript code.",  # drop_js
                'quoted line with enough words"',    # kept (quote terminal)
            ]
        ],
    )
    r = rows[0]
    assert r["n_lines"] == 5
    assert r["kept_lines"] == 2
    assert r["drop_punct"] == 1
    assert r["drop_short"] == 1
    assert r["drop_js"] == 1


def test_first_rule_charging_partitions(spark):
    # a line violating punct AND short AND js charges only punct
    rows = _run(spark, [["js javascript"], ["short js javascript."]])
    assert rows[0]["drop_punct"] == 1
    assert rows[0]["drop_short"] == 0 and rows[0]["drop_js"] == 0
    # punct ok, short first (3 words), js not charged
    assert rows[1]["drop_short"] == 1 and rows[1]["drop_js"] == 0
    for r in rows.values():
        assert (
            r["kept_lines"] + r["drop_punct"] + r["drop_short"] + r["drop_js"]
            == r["n_lines"]
        )


def test_doc_rules(spark):
    keep3 = [
        "one fine line of text.",
        "two fine lines of text.",
        "three fine lines of text.",
    ]
    rows = _run(
        spark,
        [
            keep3,                                      # kept: exactly 3
            keep3[:2],                                  # too few lines
            keep3 + ["has some Lorem Ipsum in it."],    # lorem
            keep3 + ["code block { goes here } now."],  # brace
            keep3 + ["mentions badword1 so it dies."],  # blocklist
        ],
    )
    assert not rows[0]["doc_dropped"] and not rows[0]["doc_too_few_lines"]
    assert rows[1]["doc_too_few_lines"] and rows[1]["doc_dropped"]
    assert rows[2]["doc_lorem"] and rows[2]["doc_dropped"]
    assert rows[3]["doc_brace"] and rows[3]["doc_dropped"]
    assert rows[4]["doc_blocklist"] and rows[4]["doc_dropped"]


def test_partitioning_invariance(spark):
    docs = [
        [f"line {i} {j} with good words." if j % 2 else f"short {j}"]
        + [f"tail line {i} of doc here."]
        for i in range(20)
        for j in [i % 3]
    ]
    df = spark.createDataFrame(
        [(i, lines) for i, lines in enumerate(docs)],
        "doc_id long, lines array<string>",
    )
    a = {r["id"]: r.asDict() for r in c4_line_filter(df).collect()}
    b = {
        r["id"]: r.asDict()
        for r in c4_line_filter(df.repartition(7)).collect()
    }
    assert a == b


def test_empty_docs_surface(spark):
    """ADVICE r6: a document with zero lines (empty or NULL array) must
    surface with all counters 0 and doc_dropped=true, not vanish."""
    df = spark.createDataFrame(
        [
            (0, ["one fine line of text."] * 3),
            (1, []),
            (2, None),
        ],
        "doc_id long, lines array<string>",
    )
    rows = {r["id"]: r.asDict() for r in c4_line_filter(df).collect()}
    assert set(rows) == {0, 1, 2}
    for i in (1, 2):
        r = rows[i]
        assert r["n_lines"] == 0 and r["kept_lines"] == 0
        assert r["doc_too_few_lines"] and r["doc_dropped"]
        assert not (r["doc_lorem"] or r["doc_brace"] or r["doc_blocklist"])
    assert not rows[0]["doc_dropped"]


def test_blocklist_is_data_not_regex(spark):
    """ADVICE r6: blocklist terms with regex metacharacters must be
    escaped, and an empty blocklist must never fire."""
    df = spark.createDataFrame(
        [
            (0, ["we write c++ code all day."] * 3),
            (1, ["plain words only over here."] * 3),
        ],
        "doc_id long, lines array<string>",
    )
    rows = {
        r["id"]: r.asDict()
        for r in c4_line_filter(df, blocklist=("c++",)).collect()
    }
    assert rows[0]["doc_blocklist"] and not rows[1]["doc_blocklist"]
    empty = {
        r["id"]: r.asDict()
        for r in c4_line_filter(df, blocklist=()).collect()
    }
    assert not any(r["doc_blocklist"] for r in empty.values())
