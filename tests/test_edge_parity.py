"""Cross-engine parity on EDGE corpora for the round-4 ops: the
sf-dir oracle sweep (tools/check_oracles.py) checks the generator's
well-formed corpus — this runs the same Spark-vs-DuckDB comparison
over hostile documents (NULLs, empties, unicode, punctuation soup,
single tokens) where expression-semantics differences actually live."""

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from check_oracles import norm_cell, value_hash  # noqa: E402

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, None, None, "src0", None),
    (1, "", "en", "src0", 0),
    (2, "x", "en", "src1", 1),
    (3, "   \t\n  ", None, "src1", 7),
    (4, "!!! ??? ... ---", "de", "src2", 15),
    (5, "héllo wörld café naïve", "fr", "src2", 22),
    (6, "日本語のテキスト 🚀 emoji", "ja", "src3", 15),
    (7, "a a a a a a a a a a", "en", "src3", 19),
    (8, "7 77 777 7777 77777", "en", "src4", 19),
    (9, "the quick brown fox jumps over the lazy dog again and again",
     "en", "src4", 60),
    (10, "ab " * 300, "en", "src5", 900),
    (11, "one-token", "en", "src5", 9),
]

#: round-4 ops whose oracles must agree on the edge corpus
OPS = [
    "c4_line_filter",
    "lm_perplexity",
    "dsir_select",
    "bpe_train",
    "text_fingerprint_repetition",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    df = spark.createDataFrame(
        EDGE_DOCS,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def entry():
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", OPS)
def test_edge_corpus_parity(spark, edge_dir, entry, name):
    from docwire_spark.ops.common import release_persisted

    qs, oracles = entry.queries(), entry.oracle_sql()
    df = qs[name](spark, edge_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    release_persisted()

    con = duckdb.connect()
    # Spark writes documents.parquet as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{edge_dir}/documents.parquet/*.parquet')"
    )
    res = con.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(cols) == sorted(ocols), name
    assert len(rows) == len(orows), (
        name, len(rows), len(orows),
    )
    hs, ho = value_hash(rows, cols), value_hash(orows, ocols)
    if hs != ho:
        order_s = sorted(range(len(cols)), key=lambda i: cols[i])
        order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
        ls = sorted(
            "\x1f".join(norm_cell(r[i]) for i in order_s) for r in rows
        )
        lo = sorted(
            "\x1f".join(norm_cell(r[i]) for i in order_o) for r in orows
        )
        diffs = [(a, b) for a, b in zip(ls, lo) if a != b][:3]
        pytest.fail(f"{name} value-hash mismatch, first diffs: {diffs}")
