"""Semantics + plan gates for the as-of attribution join and the
deterministic stratified sampler."""

from __future__ import annotations

import datetime
import hashlib
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


@pytest.fixture(scope="module")
def asof_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("asofevents"))
    T = datetime.datetime
    rows = [
        # user 1: click, purchase, click, purchase (attribution moves)
        (10, T(2024, 1, 1, 0, 0, 0), 1, "click", 1.0, "{}"),
        (11, T(2024, 1, 1, 0, 5, 0), 1, "purchase", 2.0, "{}"),
        (12, T(2024, 1, 1, 0, 6, 0), 1, "click", 1.0, "{}"),
        (13, T(2024, 1, 1, 0, 9, 0), 1, "purchase", 2.0, "{}"),
        # user 2: purchase with NO prior click -> NULL attribution
        (20, T(2024, 1, 1, 1, 0, 0), 2, "purchase", 2.0, "{}"),
        (21, T(2024, 1, 1, 1, 1, 0), 2, "click", 1.0, "{}"),
        # user 3: click at the EXACT purchase timestamp counts (<=)
        (30, T(2024, 1, 1, 2, 0, 0), 3, "click", 1.0, "{}"),
        (31, T(2024, 1, 1, 2, 0, 0), 3, "purchase", 2.0, "{}"),
        # noise the filter must drop
        (40, T(2024, 1, 1, 0, 1, 0), 1, "view", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_asof_attribution_semantics(spark, asof_dir):
    from docwire_spark.ops.relational import events_asof_attribution

    got = {
        r["purchase_id"]: (r["click_id"], r["gap_us"])
        for r in events_asof_attribution(spark, asof_dir).collect()
    }
    assert got == {
        11: (10, 5 * 60 * 1_000_000),   # latest click before it
        13: (12, 3 * 60 * 1_000_000),   # re-attributed to the newer click
        20: (None, None),               # no prior click
        31: (30, 0),                    # equal-timestamp click included
    }


def test_asof_attribution_single_shuffle_with_pushdown(spark):
    """The union-trick as-of join must cost exactly ONE Exchange (the
    user_id window shuffle) and push the event_type IN filter to the
    scan."""
    from docwire_spark.ops.relational import events_asof_attribution

    plan = _plan(events_asof_attribution(spark, SF_DIR))
    assert plan.count("Exchange") == 1
    assert "PushedFilters: [In(event_type" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_sample_stratified_matches_python_md5(spark):
    """Every keep decision recomputable from hashlib; rates land near
    their stratum targets."""
    from docwire_spark.ops.corpus_filter import (
        SAMPLE_RATES, sample_stratified,
    )

    rows = sample_stratified(spark, SF_DIR).collect()
    per_stratum = {}
    for r in rows:
        u8 = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
        assert r["u8"] == u8
        idx = int(r["source"][3:])
        rate = next(rt for bound, rt in SAMPLE_RATES if idx < bound)
        expect = 1 if (rate >= 1.0 or int(u8, 16) < int(rate * 2**32)) else 0
        assert r["keep"] == expect, (r["doc_id"], r["source"])
        tot, kept = per_stratum.get(rate, (0, 0))
        per_stratum[rate] = (tot + 1, kept + r["keep"])
    for rate, (tot, kept) in per_stratum.items():
        if rate >= 1.0:
            assert kept == tot
        elif tot >= 20:
            assert abs(kept / tot - rate) < 0.25


def test_sample_stratified_is_deterministic(spark):
    from docwire_spark.ops.corpus_filter import sample_stratified

    a = sorted(map(tuple, sample_stratified(spark, SF_DIR).collect()))
    b = sorted(map(tuple, sample_stratified(spark, SF_DIR).collect()))
    assert a == b
