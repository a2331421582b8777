"""Cross-ENGINE parity on the hostile corpus (upgrade of
test_hostile_corpus, which only asserts no-crash): representative
token-deriving ops must produce IDENTICAL results to their DuckDB
oracles when the corpus is salted with NULL text, empty text,
whitespace-only and 1-token rows — the degenerate class where Spark
and DuckDB NULL semantics diverge (size(NULL) = -1 vs len(NULL) =
NULL; see common.TOKENS_EXPR's coalesce-to-empty contract).

The driver's CORRECTNESS gate runs on null-free synthetic testdata;
this suite is what proves the same queries stay oracle-true on the
rows a real 10^12-page crawl is guaranteed to contain.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.check_oracles import value_hash  # noqa: E402

#: token-deriving ops whose fixtures the hostile documents/embeddings
#: tables satisfy — one per family that consumes the token array
PARITY_OPS = [
    "text_token_stats",
    "text_quality",
    "text_fingerprint_repetition",
    "text_ngram_topk",
    "text_length_percentiles",
    "c4_line_filter",
    "corpus_quality_filter",
    "bm25_search",
    "decontaminate",
    "lang_balance",
    "lm_perplexity",
    "dsir_select",
    "bpe_train",
    "bpe_encode",
    "inverted_index",
    "dedup_exact",
    "dedup_chunk_exact",
    "dedup_chunk_rewrite",
    "dedup_substring",
    "pack_sequences",
    "chunk_windows",
]


@pytest.fixture(scope="module")
def hostile_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostileparity"))
    base = (
        "the a of to in is it on for data spark table row value key part "
        "merge scan filter join hash batch stream window group order line"
    )
    docs = [
        *[
            (i, f"{base} doc {i} variant words here", "en", f"src{i % 20}",
             len(base) + 20)
            for i in range(24)
        ],
        (24, "", "en", "src0", 0),             # empty text
        (25, None, "en", "src1", 0),           # NULL text
        (26, "x", "en", "src2", 1),            # one token
        (27, "   \t\n  ", "en", "src3", 7),    # whitespace only
        (28, "7", None, None, 1),              # NULL lang + source
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    vecs = [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(64)], i % 8)
            for i in range(40)]
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_token_ops_match_oracles_on_hostile_rows(spark, hostile_dir):
    import __spark_entry__ as entry
    from docwire_spark.ops.common import release_persisted

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(hostile_dir, t + '.parquet', '*.parquet')}'"
        )
    mismatches = []
    for name in PARITY_OPS:
        df = qs[name](spark, hostile_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        release_persisted()
        res = con.execute(oracles[name])
        ocols = [c[0] for c in res.description]
        orows = res.fetchall()
        if sorted(cols) != sorted(ocols):
            mismatches.append(f"{name}: cols {sorted(cols)} != "
                              f"{sorted(ocols)}")
        elif len(rows) != len(orows):
            mismatches.append(f"{name}: rows {len(rows)} != {len(orows)}")
        elif value_hash(rows, cols) != value_hash(orows, ocols):
            mismatches.append(f"{name}: value-hash mismatch")
    assert not mismatches, mismatches
