from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from featureengineer_spark.operators.curation import temperature_mix
from featureengineer_spark.operators.textstats import with_perplexity_buckets
from featureengineer_spark.operators.weburl import with_html_stats, with_html_text


# ---------- HTML extraction ----------

HTML_DOC = (
    "<html><head><title>T</title><style>p{color:red}</style>"
    "<script type='text/js'>var x = '<p>not text</p>';</script></head>"
    "<body><!-- hidden comment --><h1>Hello&nbsp;World</h1>"
    "<p>alpha &amp; beta &lt;tag&gt;</p>"
    "<a href='/x'>nav link</a><a href='/y'><b>bold</b> link</a></body></html>"
)


def test_html_text_extraction(spark):
    df = spark.createDataFrame([(1, HTML_DOC)], ["doc_id", "html"])
    row = with_html_text(df).collect()[0]
    assert row.extracted_text == (
        "T Hello World alpha & beta <tag> nav link bold link"
    )


def test_html_extraction_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "plain text no tags"), (4, "&amp;amp;")],
        ["doc_id", "html"],
    )
    got = {r.doc_id: r.extracted_text for r in with_html_text(df).collect()}
    assert got == {1: "", 2: "", 3: "plain text no tags", 4: "&amp;"}


def test_html_stats(spark):
    df = spark.createDataFrame([(1, HTML_DOC)], ["doc_id", "html"])
    row = with_html_stats(df).collect()[0]
    text = "T Hello World alpha & beta <tag> nav link bold link"
    anchor_chars = len("nav link") + len("bold link")
    assert row.link_density == pytest.approx(anchor_chars / len(text))
    assert row.text_ratio == pytest.approx(len(text) / len(HTML_DOC))
    assert row.tag_count > 10


# ---------- temperature mixing ----------

def _mk_domain_docs(spark, sizes: dict[str, int], tokens_per_doc: int = 10):
    rows = []
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang, tokens_per_doc))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "lang", "n_tokens"])


def test_temperature_alpha1_is_proportional(spark):
    df = _mk_domain_docs(spark, {"en": 800, "fr": 200})
    # alpha=1: shares stay proportional -> every domain gets the same
    # keep fraction total_budget / grand_total.
    out = temperature_mix(df, total_tokens=5000, alpha=1.0, seed=3)
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got["en"] / 800 == pytest.approx(0.5, abs=0.08)
    assert got["fr"] / 200 == pytest.approx(0.5, abs=0.10)


def test_temperature_low_alpha_boosts_tail(spark):
    df = _mk_domain_docs(spark, {"en": 900, "fr": 100})
    out = temperature_mix(df, total_tokens=5000, alpha=0.3, seed=3)
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    # expected fractions from the formula
    we, wf = 9000 ** 0.3, 1000 ** 0.3
    fr_frac = min(1.0, (wf / (we + wf)) * 5000 / 1000)
    en_frac = min(1.0, (we / (we + wf)) * 5000 / 9000)
    assert fr_frac > en_frac  # tail boosted
    assert got["fr"] / 100 == pytest.approx(fr_frac, abs=0.12)
    assert got["en"] / 900 == pytest.approx(en_frac, abs=0.07)


def test_temperature_mix_nested_under_budget_increase(spark):
    df = _mk_domain_docs(spark, {"en": 300, "fr": 100})
    small = {r.doc_id for r in temperature_mix(df, 1000, alpha=0.5, seed=7).collect()}
    big = {r.doc_id for r in temperature_mix(df, 3000, alpha=0.5, seed=7).collect()}
    assert small <= big


def test_temperature_mix_caps_at_one_epoch(spark):
    # huge budget: every domain capped at frac 1.0 -> all rows kept
    df = _mk_domain_docs(spark, {"en": 50, "fr": 50})
    out = temperature_mix(df, total_tokens=10**9, alpha=0.5, seed=1)
    assert out.count() == 100


def test_temperature_mix_null_domain_gets_own_group(spark):
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 10), (3, "en", 10)],
        ["doc_id", "lang", "n_tokens"],
    )
    out = temperature_mix(df, total_tokens=10**9, alpha=0.5, seed=1)
    assert out.count() == 3  # nothing silently dropped


# ---------- CCNet perplexity buckets ----------

def test_perplexity_buckets(spark):
    fluent = "the model trains on the data and the model improves on the data"
    rows = [(i, "en", fluent) for i in range(8)]
    # word salad from the same vocabulary
    rows += [(100 + i, "en", "data the on model improves and trains the on the") for i in range(4)]
    rows += [(200, "en", "tiny")]  # unscorable: < 2 tokens
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = with_perplexity_buckets(df).select("doc_id", "perplexity", "ppl_bucket")
    got = {r.doc_id: (r.perplexity, r.ppl_bucket) for r in out.collect()}
    assert got[200] == (None, None)
    # fluent docs score lower perplexity than salad docs
    assert got[0][0] < got[100][0]
    # buckets partition the scored docs and respect the ordering
    assert got[0][1] == "head" and got[100][1] == "tail"
    order = {"head": 0, "middle": 1, "tail": 2}
    scored = [(p, order[b]) for p, b in got.values() if p is not None]
    scored.sort()
    assert [b for _, b in scored] == sorted(b for _, b in scored)


def test_perplexity_buckets_quantile_sizes(spark):
    # 100 distinct-score docs, global grouping: head ~33, middle ~34, tail ~33
    rows = [(i, "x " * (i % 17 + 2) + "y z " * (i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = with_perplexity_buckets(df, group_col=None)
    counts = {r["ppl_bucket"]: r["cnt"] for r in
              out.groupBy("ppl_bucket").agg(F.count("*").alias("cnt")).collect()}
    assert abs(counts["head"] - 33) <= 12
    assert sum(counts.values()) == 100
