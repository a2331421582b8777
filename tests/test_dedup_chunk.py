"""Semantics gate for exact substring-chunk dedup (Lee et al. 2021 /
SlimPajama chunk simplification): non-overlapping CHUNK_K-token
chunks, keep-first policy — an occurrence survives only in the doc
with minimal (doc_id, position) corpus-wide.

Crafted corpus pins every column exactly; the oracle parity at
testdata scale is covered by tools/check_oracles.py (driver gate).
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def chunk_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chunkdocs"))
    rows = [
        (0, "a b c d e f g h i j"),          # chunks: "a b c d e", "f g h i j"
        (1, "a b c d e f g h i j"),          # exact dup of doc 0
        (2, "a b c d e x y z w q"),          # 1st chunk shared, 2nd unique
        (3, "too short"),                    # < CHUNK_K tokens -> 0 chunks
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_chunk_dedup_keep_first(spark, chunk_dir):
    from docwire_spark.ops.dedup import dedup_chunk_exact

    got = {
        r["doc_id"]: (
            r["n_chunks"], r["n_dup_chunks"], r["dup_chunk_frac"],
            r["n_kept_chunks"],
        )
        for r in dedup_chunk_exact(spark, chunk_dir).collect()
    }
    assert got == {
        0: (2, 2, 1.0, 2),   # first occurrence of both chunks
        1: (2, 2, 1.0, 0),   # every chunk seen earlier in doc 0
        2: (2, 1, 0.5, 1),   # "a b c d e" dup (kept in doc 0); "x y z w q" unique
        3: (0, 0, 0.0, 0),   # too short to emit a chunk
    }


def test_chunk_dedup_conservation(spark, chunk_dir):
    """Kept chunks across the corpus == distinct chunks (each distinct
    chunk survives exactly once, in its first occurrence)."""
    from pyspark.sql import functions as F

    from docwire_spark.ops.dedup import dedup_chunk_exact

    df = dedup_chunk_exact(spark, chunk_dir)
    agg = df.agg(
        F.sum("n_kept_chunks").alias("kept"), F.sum("n_chunks").alias("total")
    ).collect()[0]
    assert agg["kept"] == 3    # {"a b c d e", "f g h i j", "x y z w q"}
    assert agg["total"] == 6


def test_chunk_rewrite_outputs_cleaned_text(spark, chunk_dir):
    """The rewrite transform keeps surviving chunks in original order
    and drops the <CHUNK_K-token tail (both engines model the same)."""
    from docwire_spark.ops.dedup import dedup_chunk_rewrite

    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept_chunks"])
        for r in dedup_chunk_rewrite(spark, chunk_dir).collect()
    }
    assert got == {
        0: ("a b c d e f g h i j", 2),   # first occurrence: all kept
        1: ("", 0),                      # exact dup: fully removed
        2: ("x y z w q", 1),             # shared chunk gone, unique kept
        3: ("", 0),                      # no full chunk to keep
    }
