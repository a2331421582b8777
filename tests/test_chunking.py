"""Sliding-window chunking: coverage/overlap invariants, degenerate
docs, and the map-only plan shape."""

from pyspark.sql import functions as F

from docwire_spark.ops.chunking import STRIDE, WINDOW, chunk_windows

SF = "/root/testdata/sf0.01"


def test_every_token_is_covered_and_overlap_is_exact(spark):
    chunks = chunk_windows(spark, SF).collect()
    docs = {
        r.doc_id: len(r.ts)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr(
            "doc_id",
            "regexp_extract_all(lower(coalesce(text,'')),"
            " '[a-z0-9]+', 0) AS ts",
        ).collect()
    }
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    for doc_id, n_tok in docs.items():
        cs = sorted(by_doc.get(doc_id, []), key=lambda c: c.chunk_id)
        if n_tok == 0:
            assert not cs  # nothing to embed
            continue
        assert cs[0].tok_start == 1
        assert cs[-1].tok_end == n_tok  # full coverage
        for a, b in zip(cs, cs[1:]):
            assert b.tok_start - a.tok_start == STRIDE
            # adjacent windows overlap (context preserved) until the
            # previous window is the tail
            if a.tok_end < n_tok:
                assert b.tok_start <= a.tok_end + 1
        for c in cs:
            assert c.tok_end - c.tok_start + 1 <= WINDOW
            assert len(c.chunk_text.split(" ")) == (
                c.tok_end - c.tok_start + 1
            )


def test_short_doc_yields_exactly_one_chunk(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    import unittest.mock as mock

    import docwire_spark.ops.chunking as C

    with mock.patch.object(C, "load", lambda sp, sf, name, **kw: df):
        out = C.chunk_windows(spark, SF).collect()
    assert len(out) == 1
    (c,) = out
    assert (c.doc_id, c.chunk_id, c.tok_start, c.tok_end) == (1, 0, 1, 3)
    assert c.chunk_text == "alpha beta gamma"


def test_chunking_is_map_only(spark):
    plan = chunk_windows(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
