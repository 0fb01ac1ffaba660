"""Paragraph-level dedup (operators/paragraphs.py)."""

BOILER = "subscribe to our newsletter for updates"


def _docs(spark):
    rows = [
        (1, "alpha beta gamma\n\n" + BOILER + "\n\nunique tail one"),
        (2, BOILER + "\n\nsomething else entirely here"),
        (3, "totally original content\n\n" + BOILER),
        (4, BOILER),              # nothing but boilerplate
        (5, ""),                  # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_regex_preserves_order(spark):
    from featureengineer_spark.operators.paragraphs import split_paragraphs

    out = (
        split_paragraphs(_docs(spark))
        .filter("doc_id = 1")
        .orderBy("para_idx")
        .collect()
    )
    assert [r["para"] for r in out] == [
        "alpha beta gamma", BOILER, "unique tail one",
    ]
    assert [r["para_idx"] for r in out] == [0, 1, 2]


def test_duplicated_groups_finds_boilerplate(spark):
    from featureengineer_spark.operators.paragraphs import (
        duplicated_paragraph_groups,
        split_paragraphs,
    )

    groups = duplicated_paragraph_groups(
        split_paragraphs(_docs(spark))
    ).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_occurrences"] == 4
    assert g["n_docs"] == 4
    assert g["first_doc_id"] == 1


def test_drop_keeps_first_global_occurrence(spark):
    from featureengineer_spark.operators.paragraphs import (
        drop_duplicate_paragraphs,
    )

    out = {
        r["doc_id"]: r.asDict()
        for r in drop_duplicate_paragraphs(_docs(spark)).collect()
    }
    # doc 1 holds the first occurrence — keeps everything
    assert out[1]["text"] == "alpha beta gamma\n\n" + BOILER + "\n\nunique tail one"
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (3, 3)
    # later docs lose the boilerplate paragraph but keep their own
    assert out[2]["text"] == "something else entirely here"
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["text"] == "totally original content"
    # all-boilerplate doc survives as an EMPTY row, not a missing row
    assert out[4]["text"] == ""
    assert (out[4]["n_paras"], out[4]["n_kept"]) == (1, 0)
    # empty doc: single empty paragraph, first-seen… but doc 5's "" para
    # is unique (no other doc splits to ""), so it survives
    assert out[5]["n_paras"] == 1


def test_blocks_mode_boundaries(spark):
    from featureengineer_spark.operators.paragraphs import split_paragraphs

    df = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4 w5 w6")], "doc_id long, text string"
    )
    out = (
        split_paragraphs(df, mode="blocks", block_words=3)
        .orderBy("para_idx")
        .collect()
    )
    assert [r["para"] for r in out] == ["w0 w1 w2", "w3 w4 w5", "w6"]


def test_blocks_mode_dedup_cross_doc(spark):
    from featureengineer_spark.operators.paragraphs import (
        drop_duplicate_paragraphs,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c x y z")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in drop_duplicate_paragraphs(
            df, mode="blocks", block_words=3
        ).collect()
    }
    assert out[1]["text"] == "a b c d e f"
    assert out[2]["text"] == "x y z"          # shared leading block removed
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
