"""Semantics tests for text_normalize and text_length_percentiles."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def test_text_normalize_output_is_clean(spark):
    from docwire_spark.ops.textstats import text_normalize

    rows = text_normalize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        t = r["norm_text"]
        # no typographic junk, no controls, no doubled whitespace
        for bad in "“”‘’—–\xa0\x07​":
            assert bad not in t
        assert "  " not in t
        assert t == t.strip()
        # the injected junk produced real work
        assert r["n_chars_dropped"] >= 2      # bell + zero-width deleted
        assert r["n_ws_collapsed"] >= 2       # doubled spaces + trim
        # folded ASCII replacements survived
        assert t.startswith('"q"')
        assert "- a" in t and "bc end" in t


def test_length_percentiles_ordered_and_bounded(spark):
    from docwire_spark.ops.textstats import length_percentiles
    from docwire_spark.ops.common import load

    rows = length_percentiles(spark, SF_DIR).collect()
    assert rows
    assert sum(r["n_docs"] for r in rows) == load(
        spark, SF_DIR, "documents"
    ).count()
    for r in rows:
        assert 0 < r["p50"] <= r["p90"] <= r["p99"] <= r["max_tok"]
