"""Physical-plan guards: the optimizations we rely on at 100 TB must be
visible in the executed plan, not assumed (SURVEY.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_quantity") > 30
    ).select("l_orderkey", "l_quantity")
    plan = _plan(li)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" in plan, plan


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    plan = _plan(li)
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan, plan


def test_small_dims_broadcast(spark):
    plan = _plan(entry.q_join_rollup(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_window_stack_single_exchange(spark):
    from bench import feature_pipeline

    t = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    plan = _plan(feature_pipeline(t))
    assert plan.count("Exchange") == 1, plan


def test_asof_single_exchange_single_sort(spark):
    from featureengineer_spark.operators import asof_join

    t = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    a = spark.createDataFrame([], "conv_id string, anchor_ts timestamp")
    plan = _plan(asof_join(t, a, value_cols=["turn_idx", "role"]))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window [") == 1, plan


def test_featurize_fast_prunes_text_from_shuffle(spark):
    from featureengineer_spark.kernels import featurize_fast

    t = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    plan = _plan(featurize_fast(t))
    # text feeds the pre-projection but must not appear in exchange output
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines and all("text#" not in l for l in exchange_lines), plan


def test_whole_stage_codegen_covers_window_stack(spark):
    from bench import feature_pipeline

    # AQE wraps the plan until first execution; disable it to see the
    # codegen spans statically
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t = spark.createDataFrame(
            [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
        plan = _plan(feature_pipeline(t))
        # '*(n)' prefixes mark whole-stage-codegen spans in plan text
        assert "*(" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
