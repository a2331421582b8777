"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` pairs cover the operator inventory
from SURVEY.md §2 plus the training-data ops (dedup, similarity
search, text analysis, multimodal plumbing).  The ``extract_*``
queries run the REAL distributed extraction pipeline (url-hash
sharding -> mapInPandas kernel) and their oracles reconstruct the
expected bytes analytically — a byte-identity gate through DuckDB.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _ship(spark: SparkSession) -> None:
    """Make docwire_spark importable on executors (mapInPandas body
    imports the kernel there)."""
    try:
        from docwire_spark.spark.session import ship_package

        ship_package(spark)
    except Exception:
        pass  # already shipped, or PYTHONPATH already covers the repo


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (sniff -> charset -> HTML5
    DOM -> whitespace machine -> plain-text render) over a pages table
    synthesized from sf0.001 documents, via oversize-split + url-hash
    sharding + mapInPandas."""
    _ship(spark)
    from pyspark.sql import functions as F

    from docwire_spark.ops.common import load
    from docwire_spark.spark.extract import extract_pages

    docs = load(spark, DEFAULT_SF_DIR, "documents")
    pages = docs.select(
        F.concat(F.lit("https://synth.local/d/"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>d</title></head><body><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    res = extract_pages(pages, n_shards=16)
    return res.select(
        "url", "mime", "mime_confidence", "extracted_text", "n_events",
        "bytes_in", "bucket", "error",
    )


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship(spark)
        return fn(spark, sf_dir)

    return run


def _collect():
    from docwire_spark.ops import (
        bloom, chunking, classify, cluster, cms, corpus_filter, dedup, diff,
        extraction, extraction_binary, graph, hll, index, multimodal, packing,
        relational, similarity, stream_extract, textstats, web, zorder,
    )

    modules = (extraction, extraction_binary, stream_extract, textstats,
               corpus_filter, index, cluster, web, graph, packing, diff, dedup,
               similarity, multimodal, relational, bloom, classify, hll,
               zorder, cms, chunking)
    q: dict[str, Callable] = {}
    o: dict[str, str] = {}
    for m in modules:
        for name, fn in m.QUERIES.items():
            q[name] = _wrap(fn)
        o.update(m.ORACLES)
    return q, o


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _collect()
    return q


def oracle_sql() -> dict[str, str]:
    _, o = _collect()
    return o
