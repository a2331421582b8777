"""Semantics test for corpus_diff."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def test_corpus_diff_statuses(spark):
    from docwire_spark.ops.diff import (
        CHG_MOD, CHG_REM, NEW_DROP_MOD, NEW_DROP_REM, OLD_DROP_MOD,
        OLD_DROP_REM, corpus_diff,
    )
    from docwire_spark.ops.common import load

    n = load(spark, SF_DIR, "documents").count()
    got = {r["doc_id"]: r["status"] for r in corpus_diff(spark, SF_DIR).collect()}
    for i in range(n):
        in_old = i % OLD_DROP_MOD != OLD_DROP_REM
        in_new = i % NEW_DROP_MOD != NEW_DROP_REM
        if not in_old and not in_new:
            assert i not in got
            continue
        want = (
            "added" if not in_old
            else "removed" if not in_new
            else "changed" if i % CHG_MOD == CHG_REM
            else "unchanged"
        )
        assert got[i] == want, (i, got[i], want)
    # all four classes occur
    assert set(got.values()) == {"added", "removed", "changed", "unchanged"}
