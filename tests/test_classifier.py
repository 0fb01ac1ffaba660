"""Hashed-ngram logistic quality classifier: reference parity,
separation, scoring parity, determinism, degenerate docs."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest

from featureengineer_spark.operators.classifier import (
    quality_classifier_filter,
    score_quality,
    train_quality_classifier,
)

N_BUCKETS = 64


def _norm_words(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9\s]", " ", (text or "").lower())
    t = re.sub(r"\s+", " ", t).strip()
    return [w for w in t.split(" ") if w]


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _features(text: str) -> list[int]:
    ws = _norm_words(text)
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [_bucket(g) for g in grams]


def _ref_train(docs, n_iter=20, lr=1.0, l2=1e-4):
    """Pure-numpy full-batch GD over the identical feature map."""
    w = np.zeros(N_BUCKETS)
    b = 0.0
    rows = []
    for _, text, y in docs:
        f = _features(text)
        x = np.zeros(N_BUCKETS)
        for j in f:
            x[j] += 1.0
        if f:
            x /= len(f)
        rows.append((x, float(y)))
    for _ in range(n_iter):
        grad = np.zeros(N_BUCKETS)
        gb = 0.0
        for x, y in rows:
            p = 1.0 / (1.0 + np.exp(-(b + w @ x)))
            grad += x * (p - y)
            gb += p - y
        n = len(rows)
        w = w - lr * (grad / n + l2 * w)
        b = b - lr * gb / n
    return w, b


DOCS = [
    (1, "excellent wonderful prose with careful structure", 1),
    (2, "spam junk click here buy now cheap", 0),
    (3, "wonderful careful writing excellent clarity", 1),
    (4, "buy cheap junk now spam spam spam", 0),
    (5, "a thoughtful essay with excellent structure and prose", 1),
    (6, "click click buy buy cheap cheap junk", 0),
    (7, "structure and clarity define excellent writing", 1),
    (8, "now now now buy junk click spam", 0),
    (9, "", 0),
    (10, "neutral words about various topics", 1),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, label int"
    ).repartition(4)


@pytest.fixture(scope="module")
def model(docs_df):
    return train_quality_classifier(
        docs_df, label_col="label", n_buckets=N_BUCKETS, n_iter=20,
        lr=1.0, l2=1e-4,
    )


def test_matches_numpy_reference(model):
    w_ref, b_ref = _ref_train(DOCS, n_iter=20, lr=1.0, l2=1e-4)
    np.testing.assert_allclose(model.weights, w_ref, atol=1e-9)
    assert abs(model.bias - b_ref) < 1e-9


def test_loss_decreases(model):
    assert model.loss_history[-1] < model.loss_history[0]


def test_separates_classes(docs_df, model):
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs_df, model).collect()
    }
    pos = [scored[i] for i, _, y in DOCS if y == 1 and i != 10]
    neg = [scored[i] for i, _, y in DOCS if y == 0 and i != 9]
    assert min(pos) > max(neg)


def test_scoring_matches_numpy(docs_df, model):
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs_df, model).collect()
    }
    for doc_id, text, _ in DOCS:
        f = _features(text)
        dot = sum(model.weights[j] for j in f) / len(f) if f else 0.0
        p = 1.0 / (1.0 + np.exp(-(model.bias + dot)))
        assert scored[doc_id] == pytest.approx(p, abs=1e-9)


def test_empty_doc_scores_bias(docs_df, model):
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs_df, model).collect()
    }
    assert scored[9] == pytest.approx(
        1.0 / (1.0 + np.exp(-model.bias)), abs=1e-12
    )


def test_training_deterministic(docs_df, model):
    """Same-session retrain reproduces the model to well under the 12-dp
    rounding both the gate query and its captured oracle literals apply.

    Tolerance (1e-12 relative), NOT exact equality: the gradient partials
    fold bit-deterministically in pid order, but AQE's runtime partition
    coalescing may group the persisted feature frame differently between
    otherwise identical runs, regrouping the floating-point partial sums
    below that rounding threshold (observed ~1-in-3 as an exact-compare
    flake). Pinning the physical layout instead would CHANGE the trained
    weights relative to the captured quality_clf_sf001.json literals the
    frozen oracle embeds, so the contract is: drift must stay under the
    shared 12-dp rounding, which is what this asserts."""
    again = train_quality_classifier(
        docs_df, label_col="label", n_buckets=N_BUCKETS, n_iter=20,
        lr=1.0, l2=1e-4,
    )
    np.testing.assert_allclose(model.weights, again.weights, rtol=0, atol=1e-12)
    assert abs(model.bias - again.bias) <= 1e-12


def test_filter_threshold(docs_df, model):
    kept = quality_classifier_filter(docs_df, model, threshold=0.5)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs_df, model).collect()
    }
    assert ids == {i for i, p in scored.items() if p >= 0.5}
