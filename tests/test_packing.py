"""Semantics + plan tests for GPT-style sequence packing."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def test_packing_matches_sequential_replay(spark):
    """The two-phase prefix sum must equal a literal sequential pack."""
    from docwire_spark.ops.packing import SEQ_LEN, pack_sequences

    rows = sorted(
        pack_sequences(spark, SF_DIR).collect(), key=lambda r: r["doc_id"]
    )
    cum = 0
    for r in rows:
        assert r["seq_id"] == cum // SEQ_LEN, r
        assert r["seq_offset"] == cum % SEQ_LEN, r
        want_span = (
            0 if r["n_tok"] == 0
            else (cum + r["n_tok"] - 1) // SEQ_LEN - cum // SEQ_LEN + 1
        )
        assert r["n_seqs_spanned"] == want_span, r
        cum += r["n_tok"]
    # non-degenerate: the corpus spans many sequences and some doc
    # crosses a boundary
    assert rows[-1]["seq_id"] > 10
    assert any(r["n_seqs_spanned"] > 1 for r in rows)


def test_packing_is_stable_across_partitionings(spark):
    from docwire_spark.ops.packing import pack_sequences

    a = {r["doc_id"]: (r["seq_id"], r["seq_offset"])
         for r in pack_sequences(spark, SF_DIR).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {r["doc_id"]: (r["seq_id"], r["seq_offset"])
             for r in pack_sequences(spark, SF_DIR).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_packing_avoids_global_single_partition_window_on_docs(spark):
    """The doc-level running sum must be partitioned by bucket; only
    the bucket-total table (corpus/BUCKET rows) may use an
    unpartitioned window."""
    from docwire_spark.ops.packing import pack_sequences

    plan = pack_sequences(spark, SF_DIR)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # the doc-level window declares the bucket partition key
    assert "partitionby" in plan.lower().replace(" ", "") or \
        "PartitionBy" in plan or "bkt" in plan
    # count Window operators: one bucketed (docs), one global (buckets)
    n_windows = plan.count("Window [")
    assert n_windows == 2, plan[:2000]
