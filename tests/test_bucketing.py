"""Bucketed co-located joins: the pay-the-shuffle-once-at-ingest
layout must actually eliminate the per-join Exchange."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from docwire_spark.ops.common import load
    from docwire_spark.spark.bucketing import write_bucketed

    docs = load(spark, SF_DIR, "documents")
    write_bucketed(
        docs.select("doc_id", "source", "n_chars"),
        "bt_docs", n_buckets=8,
    )
    write_bucketed(
        docs.select("doc_id", F.length("text").alias("text_len")),
        "bt_stats", n_buckets=8,
    )
    # a MISMATCHED bucket count for the negative case
    write_bucketed(
        docs.select("doc_id", "lang"), "bt_mismatch", n_buckets=4,
    )
    yield
    for t in ("bt_docs", "bt_stats", "bt_mismatch"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def no_broadcast(spark):
    """Bench-scale tables are broadcast-small, which would hide the
    co-location property behind a BroadcastHashJoin; force the
    shuffle-or-not decision the 100 TB plan faces."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_same_bucket_join_has_no_exchange(spark, bucketed_tables,
                                          no_broadcast):
    from docwire_spark.spark.bucketing import bucketed_join

    joined = bucketed_join(spark, "bt_docs", "bt_stats")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert joined.count() == spark.table("bt_docs").count()


def test_mismatched_buckets_fall_back_to_shuffle(spark, bucketed_tables,
                                                 no_broadcast):
    """Sanity check of the test itself: if bucket specs differ, Spark
    must shuffle — proving the no-Exchange assertion above is the
    bucketing at work, not some other rewrite."""
    df = spark.table("bt_docs").join(spark.table("bt_mismatch"), "doc_id")
    assert "Exchange" in _plan(df)


def test_bucketed_scan_prunes_columns(spark, bucketed_tables):
    plan = _plan(spark.table("bt_docs").select("doc_id"))
    assert "ReadSchema: struct<doc_id:bigint>" in plan
