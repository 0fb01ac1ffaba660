"""End-to-end web-curation pipeline: every planted artifact is removed
by exactly the stage that owns it, the composition equals the manual
stage chain, and a second run resumes from manifests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from featureengineer_spark.plans.webcurate import (
    WebCurationConfig,
    web_curation_pipeline,
)

BOILER = "please subscribe to our newsletter today thanks"


def _body(i: int, n: int = 54) -> str:
    return "the and for with this " + " ".join(
        f"w{i}g{j}" for j in range(n)
    )


def _docs(spark):
    rows = [
        (1, _body(1), "http://ok.com/1"),
        (2, _body(1), "http://ok.com/2"),                  # exact dup of 1
        (3, _body(3), "http://ok.com/3"),
        (4, _body(3) + " tailword", "http://ok.com/4"),    # near dup of 3
        (5, _body(5) + "\n\n" + BOILER, "http://ok.com/5"),
        (6, _body(6) + "\n\n" + BOILER, "http://ok.com/6"),  # shared boilerplate
        (7, "way too short", "http://ok.com/7"),           # gopher fail
        (8, _body(8), "http://bad.com/8"),                 # blocked domain
        (9, _body(9), "http://Example.com/a?utm_source=x"),
        (10, _body(10), "http://example.com/a"),           # url dup of 9
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, url string")


CFG = WebCurationConfig(
    url_col="url",
    blocked_domains=("bad.com",),
    gopher=True,
    paragraph_dedup=True,
    near_dup=True,
    shuffle_shards=8,
)


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("webcurate") / "run")
    docs = _docs(spark)
    out = web_curation_pipeline(spark, docs, root, CFG).run()
    return root, out.collect()


def test_each_artifact_removed_by_its_stage(result):
    _, rows = result
    ids = {r["doc_id"] for r in rows}
    assert ids == {1, 3, 5, 6, 9}
    # 2 exact-dropped, 4 near-dropped, 7 gopher-dropped, 8 blocked,
    # 10 url-dup-dropped; boilerplate paragraph survives ONCE (doc 5)
    texts = {r["doc_id"]: r["text"] for r in rows}
    assert BOILER in texts[5]
    assert BOILER not in texts[6]
    assert "w6g0" in texts[6]  # doc 6's own body intact


def test_shuffle_shards_attached(result):
    _, rows = result
    assert all(r["shard"] is not None for r in rows)
    assert {r["shard"] for r in rows} <= set(range(8))


def test_manifests_written(result):
    root, _ = result
    for stage in ["url_dedup", "gopher", "exact", "paragraphs",
                  "neardup", "shuffle"]:
        assert os.path.exists(os.path.join(root, stage, "manifest.json")), stage


def test_resume_skips_recompute(spark, result):
    root, rows = result
    # a second pipeline over the same root serves the final stage from
    # parquet: the manifest mtimes must be untouched
    mt_before = {
        s: os.path.getmtime(os.path.join(root, s, "manifest.json"))
        for s in ["exact", "neardup", "shuffle"]
    }
    again = web_curation_pipeline(spark, _docs(spark), root, CFG).run()
    assert {r["doc_id"] for r in again.collect()} == {r["doc_id"] for r in rows}
    for s, t0 in mt_before.items():
        assert os.path.getmtime(os.path.join(root, s, "manifest.json")) == t0, s


def test_matches_manual_stage_chain(spark, result):
    from featureengineer_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_candidates,
        near_dedup_filter,
    )
    from featureengineer_spark.operators.paragraphs import (
        drop_duplicate_paragraphs,
    )
    from featureengineer_spark.operators.quality import gopher_filter
    from featureengineer_spark.operators.weburl import (
        filter_blocked_domains,
        url_dedup,
    )

    df = _docs(spark)
    df = url_dedup(df, url_col="url")
    df = filter_blocked_domains(df, ["bad.com"], url_col="url")
    df = gopher_filter(df)
    df = dedup_exact(df)
    rebuilt = drop_duplicate_paragraphs(df).select("doc_id", "text")
    df = df.drop("text").join(rebuilt, on="doc_id")
    df = near_dedup_filter(df, minhash_lsh_candidates(df))
    manual = {r["doc_id"] for r in df.select("doc_id").collect()}
    _, rows = result
    assert manual == {r["doc_id"] for r in rows}


def test_config_change_invalidates_resume(spark, tmp_path):
    """Round-7 fix: the resume fingerprint folds in the FULL config, so
    rerunning at the same root with a changed value that does not alter
    the stage list (here: blocked_domains contents) recomputes instead
    of silently serving the old manifests' parquet."""
    from featureengineer_spark.plans.webcurate import (
        WebCurationConfig,
        web_curation_pipeline,
    )

    root = str(tmp_path / "cfg_resume")
    cfg_a = WebCurationConfig(
        url_col="url", blocked_domains=("bad.com",), near_dup=False,
        paragraph_dedup=False, gopher=False, shuffle_shards=None,
    )
    out_a = web_curation_pipeline(spark, _docs(spark), root, cfg_a).run()
    ids_a = {r["doc_id"] for r in out_a.collect()}
    cfg_b = WebCurationConfig(
        url_col="url", blocked_domains=(), near_dup=False,
        paragraph_dedup=False, gopher=False, shuffle_shards=None,
    )
    out_b = web_curation_pipeline(spark, _docs(spark), root, cfg_b).run()
    ids_b = {r["doc_id"] for r in out_b.collect()}
    assert ids_a < ids_b  # unblocking bad.com must bring its docs back


def test_data_fingerprint_invalidates_resume(spark, tmp_path):
    """A caller-supplied data fingerprint distinguishes different inputs
    at the same root."""
    from featureengineer_spark.plans.webcurate import (
        WebCurationConfig,
        web_curation_pipeline,
    )

    root = str(tmp_path / "data_resume")
    cfg = WebCurationConfig(
        near_dup=False, paragraph_dedup=False, gopher=False,
        shuffle_shards=None,
    )
    docs_a = _docs(spark).limit(6)
    out_a = web_curation_pipeline(
        spark, docs_a, root, cfg, data_fingerprint="snap-a"
    ).run()
    n_a = out_a.count()
    docs_b = _docs(spark)
    out_b = web_curation_pipeline(
        spark, docs_b, root, cfg, data_fingerprint="snap-b"
    ).run()
    assert out_b.count() > n_a
