"""Physical-plan shape gates for the headline queries.

These assertions pin the properties that make the plans scale-safe —
if a refactor silently turns a broadcast join into a shuffled one,
drops predicate pushdown, or introduces a cartesian product, the
suite fails even though results stay correct.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _analyzed(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushes_down_timestamp_filter(spark):
    from docwire_spark.ops.relational import pricing_summary

    plan = _plan(pricing_summary(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan


def test_extraction_scan_prunes_to_needed_columns(spark):
    """The extraction scan must read only url+html (column pruning
    reaches the parquet reader) — reading all of documents for the
    2-column projection is the wrong plan at 100 TB."""
    from pyspark.sql import functions as F

    from docwire_spark.ops.common import load
    from docwire_spark.spark.extract import extract_pages

    docs = load(spark, SF_DIR, "documents")
    pages = docs.select(
        F.concat(F.lit("https://x/"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
    )
    plan = _plan(extract_pages(pages, n_shards=4))
    # the scan must not materialize lang/source/n_chars
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_broadcast_joins_in_dim_queries(spark):
    from docwire_spark.ops.relational import orders_by_nation

    plan = _plan(orders_by_nation(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation
    assert "SortMergeJoin" not in plan


def test_dedup_verify_joins_are_broadcast(spark):
    from docwire_spark.ops.dedup import dedup_embedding, dedup_minhash_lsh

    for fn in (dedup_minhash_lsh, dedup_embedding):
        plan = _plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastHashJoin" in plan, fn.__name__


def test_extraction_has_no_shuffle(spark):
    """The no-pre-shuffle design: extract_pages without the opt-in
    repartition must contain NO Exchange — raw html bytes never move."""
    from pyspark.sql import functions as F

    from docwire_spark.ops.common import load
    from docwire_spark.spark.extract import extract_pages

    docs = load(spark, SF_DIR, "documents")
    pages = docs.select(
        F.concat(F.lit("https://x/"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
    )
    plan = _plan(extract_pages(pages, n_shards=4))
    assert "Exchange" not in plan


def test_text_stats_stay_jvm_side(spark):
    """Text analysis ops are pure Catalyst — no python evaluation
    node may appear in their plans."""
    from docwire_spark.ops import textstats

    for name, fn in textstats.QUERIES.items():
        plan = _plan(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
