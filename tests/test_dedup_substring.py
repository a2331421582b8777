"""Semantics gate for sliding-window exact-substring dedup (Lee et
al. 2022 ExactSubstr): a SUBSTR_K-token window is duplicated when its
exact token sequence occurs anywhere else in the corpus (cross-doc or
within-doc), and per-doc coverage is the UNION of duplicated windows.

Crafted corpus pins every column exactly against hand-computed
expectations; DuckDB oracle parity at testdata scale is covered by
tools/check_oracles.py (driver gate).
"""

from __future__ import annotations

import os

import pytest

import docwire_spark.ops.dedup as D

K = D.SUBSTR_K  # 15


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def sub_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("subdocs"))
    shared = _words("s", 20)  # 20-token run shared by docs 0 and 1
    rows = [
        # docs 0/1: unique prefixes, same 20-token run at DIFFERENT
        # offsets (10 vs 7 tokens in) — the unaligned case chunk
        # dedup misses
        (0, _words("a", 10) + " " + shared + " " + _words("b", 10)),
        (1, _words("c", 7) + " " + shared + " " + _words("d", 13)),
        # doc 2: self-repetition — the same K tokens twice in ONE doc
        (2, _words("e", K) + " " + _words("e", K)),
        # doc 3: all unique, long enough to have windows
        (3, _words("f", 40)),
        # doc 4: shorter than K -> zero windows
        (4, _words("g", K - 1)),
        # doc 5: NULL text -> must report 0 tokens (not Spark's
        # size(NULL) = -1), matching DuckDB's coalesce(len, 0)
        (5, None),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_substring_coverage_semantics(spark, sub_dir):
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_windows"], r["n_dup_windows"],
            r["dup_tokens"], r["dup_frac"],
        )
        for r in D.dedup_substring(spark, sub_dir).collect()
    }
    # docs 0/1: only windows fully inside the shared 20-token run are
    # duplicated: 20 - K + 1 = 6 windows, whose union is the 20-token
    # run exactly (windows straddling the unique prefix/suffix differ)
    assert got[0] == (40, 26, 6, 20, round(20 / 40, 6))
    assert got[1] == (40, 26, 6, 20, round(20 / 40, 6))
    # doc 2: tokens e0..e14 e0..e14 — every window ending at or before
    # position 16 has a twin K positions later (and vice versa); the
    # duplicated starts are 1..16 minus those whose window is unique.
    # window at start i (1-based, len 30, K=15): content is cyclic
    # e_{(i-1)%15}...; window i and window i+15 are identical for
    # i = 1 (starts 1 and 16).  Windows 2..15 have no twin (their
    # shifted copies would start at 17..30 > 16).  So dup starts are
    # {1, 16}: 2 windows, union = [1, 16) U [16, 31) = 30 tokens.
    assert got[2] == (30, 16, 2, 30, 1.0)
    # doc 3: nothing duplicated
    assert got[3] == (40, 26, 0, 0, 0.0)
    # doc 4: no windows at all
    assert got[4] == (K - 1, 0, 0, 0, 0.0)
    # doc 5: NULL text reports zeros in both engines
    assert got[5] == (0, 0, 0, 0, 0.0)


def test_substring_plan_no_cartesian(spark, sub_dir):
    df = D.dedup_substring(spark, sub_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
