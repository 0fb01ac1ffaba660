"""Winnowing fingerprints (operators/winnow.py) vs a pure-Python
reference implementing the identical selection rule."""

import hashlib
import re


def _norm(s):
    s = re.sub(r"[^a-z0-9\s]", " ", s.lower())
    return re.sub(r"\s+", " ", s).strip()


def _py_winnow(text, k, w):
    """Reference: keys h·2^22+pos, sliding-window minima over full
    windows (whole doc if fewer than w grams), deduplicated."""
    words = _norm(text).split(" ")
    n_grams = max(len(words) - (k - 1), 1)
    grams = [" ".join(words[i : i + k]) for i in range(n_grams)]
    keys = [
        (int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % (1 << 40))
        * (1 << 22)
        + i
        for i, g in enumerate(grams)
    ]
    if n_grams < w:
        sel = {min(keys)}
    else:
        sel = {min(keys[s : s + w]) for s in range(n_grams - w + 1)}
    return {(kk >> 22, kk % (1 << 22)) for kk in sel}


TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "a completely different document about spark sql window functions and joins",
    "short doc",
    "word " * 40 + "tail marker one two three",
]


def test_matches_python_reference(spark):
    from featureengineer_spark.operators.winnow import winnow_fingerprints

    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_hash"], r["fp_pos"]))
    for i, t in enumerate(TEXTS):
        assert got[i] == _py_winnow(t, 3, 4), f"doc {i}"


def test_short_doc_one_fingerprint(spark):
    from featureengineer_spark.operators.winnow import winnow_fingerprints

    df = spark.createDataFrame([(1, "only four words here")], "doc_id long, text string")
    assert winnow_fingerprints(df, k=3, w=10).count() == 1


def test_shared_run_guarantee(spark):
    """Any shared word run of ≥ w+k-1 words must yield a shared
    fingerprint HASH (the winnowing guarantee)."""
    from featureengineer_spark.operators.winnow import winnow_fingerprints

    run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    df = spark.createDataFrame(
        [
            (1, "prefix words before the run " + run),
            (2, run + " and unrelated suffix content after"),
            (3, "nothing in common with anything else at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert fps[1] & fps[2], "guarantee violated: shared run, no shared print"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_pairs(spark):
    from featureengineer_spark.operators.winnow import winnow_pairs

    run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    df = spark.createDataFrame(
        [
            (1, "prefix words before the run " + run),
            (2, run + " and unrelated suffix content after"),
            (3, "nothing in common with anything else at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    rows = winnow_pairs(df, k=3, w=4, min_shared=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["n_shared"] >= 1
    assert 0 < rows[0]["overlap"] <= 1.0


def test_pairs_plan_has_no_cartesian(spark):
    from featureengineer_spark.operators.winnow import winnow_pairs

    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    plan = (
        winnow_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
