from __future__ import annotations

import re

import pytest

from featureengineer_spark.operators.spans import (
    drop_duplicated_spans,
    duplicated_span_extents,
)


def _norm(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return t.split(" ") if t else []


def _oracle(docs: dict[str, str], l: int, min_count: int = 2):
    """Brute-force python reference: count l-gram occurrences corpus-wide,
    mark covered positions, merge extents, drop covered words."""
    grams: dict[tuple, int] = {}
    words = {d: _norm(t) for d, t in docs.items()}
    for w in words.values():
        for i in range(len(w) - l + 1):
            g = tuple(w[i : i + l])
            grams[g] = grams.get(g, 0) + 1
    extents: dict[str, list[tuple[int, int]]] = {}
    cleaned: dict[str, tuple[str, int]] = {}
    for d, w in words.items():
        starts = [
            i
            for i in range(len(w) - l + 1)
            if grams[tuple(w[i : i + l])] >= min_count
        ]
        spans: list[list[int]] = []
        for s in starts:
            if spans and s - (spans[-1][1] - l + 1) <= l:
                spans[-1][1] = max(spans[-1][1], s + l - 1)
            else:
                spans.append([s, s + l - 1])
        extents[d] = [(a + 1, b + 1) for a, b in spans]  # 1-based inclusive
        covered = set()
        for a, b in spans:
            covered.update(range(a, b + 1))
        kept = [x for j, x in enumerate(w) if j not in covered]
        cleaned[d] = (" ".join(kept), len(w) - len(kept))
    return extents, cleaned


DOCS = {
    "a": "alpha beta gamma delta epsilon zeta eta theta unique tail one",
    # shares the first 8 words with a -> one merged duplicated span
    "b": "alpha beta gamma delta epsilon zeta eta theta other ending two",
    # intra-document repeat of a 5-gram
    "c": "red orange yellow green blue filler red orange yellow green blue",
    # no duplication anywhere
    "d": "totally fresh words nobody else uses in this corpus at all",
    # shorter than l
    "e": "tiny doc",
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], ["doc_id", "text"]
    )


def test_extents_match_python_oracle(spark, docs_df):
    l = 5
    exp_ext, _ = _oracle(DOCS, l)
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_span_extents(docs_df, l=l).collect()
    }
    exp = {(d, a, b) for d, sp in exp_ext.items() for a, b in sp}
    assert got == exp
    assert any(d == "a" for d, _, _ in got)  # cross-doc dup found
    assert any(d == "c" for d, _, _ in got)  # intra-doc dup found
    assert not any(d in ("d", "e") for d, _, _ in got)


def test_span_text_is_the_covered_slice(spark, docs_df):
    rows = duplicated_span_extents(docs_df, l=5).collect()
    for r in rows:
        w = _norm(DOCS[r.doc_id])
        assert r.span_text == " ".join(w[r.span_start - 1 : r.span_end])
        assert r.span_words == r.span_end - r.span_start + 1


def test_clean_matches_python_oracle(spark, docs_df):
    l = 5
    _, exp_clean = _oracle(DOCS, l)
    got = {
        r.doc_id: (r.clean_text, r.removed_words)
        for r in drop_duplicated_spans(docs_df, l=l).collect()
    }
    assert got == exp_clean
    # every occurrence is removed (paper semantics: no canonical kept)
    assert "alpha" not in got["a"][0] and "alpha" not in got["b"][0]
    # untouched doc passes through normalized but complete
    assert got["d"] == (" ".join(_norm(DOCS["d"])), 0)
    # short doc untouched
    assert got["e"] == ("tiny doc", 0)


def test_fully_duplicated_doc_cleans_to_empty(spark):
    df = spark.createDataFrame(
        [("x", "one two three four five"), ("y", "one two three four five")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.clean_text for r in drop_duplicated_spans(df, l=5).collect()}
    assert got == {"x": "", "y": ""}


def test_min_count_threshold(spark, docs_df):
    # at min_count=3 the a/b shared block (2 occurrences) is no longer
    # duplicated "enough"; only spans with >=3 occurrences survive.
    rows = duplicated_span_extents(docs_df, l=5, min_count=3).collect()
    assert rows == []


def test_no_pairwise_join_in_plan(spark, docs_df):
    plan = duplicated_span_extents(docs_df, l=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
