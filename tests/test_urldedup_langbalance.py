"""Semantics tests for url_dedup_latest and lang_balance."""

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


def test_url_dedup_keeps_latest_capture(spark):
    from docwire_spark.ops.web import RECRAWL_MOD, url_dedup_latest
    from docwire_spark.ops.common import load

    rows = url_dedup_latest(spark, SF_DIR).collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(rows) == min(RECRAWL_MOD, n_docs)
    for r in rows:
        slot = int(r["url"].rsplit("/", 1)[1])
        # capture_day == doc_id, so the latest capture of slot s is
        # the largest doc_id congruent to s
        expect = ((n_docs - 1 - slot) // RECRAWL_MOD) * RECRAWL_MOD + slot
        assert r["kept_doc_id"] == expect, (slot, r)
        assert r["n_captures"] == (n_docs - 1 - slot) // RECRAWL_MOD + 1
        assert r["span_days"] == (r["n_captures"] - 1) * RECRAWL_MOD


def test_lang_balance_caps_each_language(spark):
    from docwire_spark.ops.corpus_filter import (
        BALANCE_DEN, BALANCE_NUM, lang_balance,
    )

    df = lang_balance(spark, SF_DIR)
    rows = df.collect()
    total = sum(r["n_tok"] for r in rows)
    cap = total // BALANCE_DEN * BALANCE_NUM
    kept_by_lang = {}
    all_by_lang = {}
    for r in rows:
        all_by_lang[r["lang"]] = all_by_lang.get(r["lang"], 0) + r["n_tok"]
        if r["keep"] == 1:
            kept_by_lang[r["lang"]] = (
                kept_by_lang.get(r["lang"], 0) + r["n_tok"]
            )
    for lang, kept in kept_by_lang.items():
        assert kept <= cap, (lang, kept, cap)
        # languages under the cap keep everything
        if all_by_lang[lang] <= cap:
            assert kept == all_by_lang[lang]
    # the dominant language was actually capped (non-degenerate corpus)
    assert any(
        all_by_lang[lang] > cap for lang in all_by_lang
    ), all_by_lang


def test_lang_balance_is_deterministic_across_partitionings(spark):
    from docwire_spark.ops.corpus_filter import lang_balance

    a = {r["doc_id"]: r["keep"] for r in lang_balance(spark, SF_DIR).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {
            r["doc_id"]: r["keep"]
            for r in lang_balance(spark, SF_DIR).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
