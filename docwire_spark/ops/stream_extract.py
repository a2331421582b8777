"""Structured Streaming extraction under the driver's oracle gate.

``extract_stream_plain`` runs the REAL streaming path end-to-end:
synthesized pages written to a parquet drop directory -> file-source
``readStream`` -> the batch-identical extraction transformation
(``streaming.extract_stream``) -> memory sink drained with
``availableNow`` -> the sink table returned as the query result.  The
DuckDB oracle is the same analytic reconstruction the batch
``extract_plain`` query uses — proving the streaming mode is
byte-identical to batch (the north-star property that downstream
consumers cannot tell which mode produced a row).
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from docwire_spark.ops.common import load

_SINK_IDS = itertools.count()


def extract_stream_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docwire_spark.streaming.extract_stream import extract_stream

    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://synth.local/d/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>d</title></head><body><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )
    drop_dir = tempfile.mkdtemp(prefix="stream_oracle_src_")
    chk_dir = tempfile.mkdtemp(prefix="stream_oracle_chk_")
    pages.write.mode("overwrite").parquet(drop_dir)

    stream_pages = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary,"
            " text string, lang string"
        )
        .format("parquet")
        .load(drop_dir)
    )
    extracted = extract_stream(stream_pages, n_shards=16)
    sink = f"stream_oracle_sink_{next(_SINK_IDS)}_{os.getpid()}"
    q = (
        extracted.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(chk_dir, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        F.element_at(F.split("url", "/"), -1).cast("bigint").alias("doc_id"),
        "mime",
        "extracted_text",
    )


EXTRACT_STREAM_PLAIN_SQL = """
SELECT doc_id, 'text/html' AS mime,
       trim(regexp_replace(text, ' +', ' ', 'g')) || chr(10) || chr(10)
         AS extracted_text
FROM documents
"""

def stream_dedup_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator under the full oracle gate:
    pages stream in as four single-file micro-batches
    (maxFilesPerTrigger=1), the applyInPandasWithState dedup keeps the
    per-host seen-fingerprint set across batches, and the emitted
    first-seen rows are projected to the deterministic (host, fp) SET
    — which duplicate row wins is order-dependent, the set of
    surviving fingerprints is not, so DuckDB can verify it exactly.
    Payload = first two tokens of each document (collides across docs
    by construction -> real in-batch AND cross-batch suppressions)."""
    from docwire_spark.streaming.dedup_stream import stream_dedup

    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/d/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(
            F.expr(
                "array_join(slice(regexp_extract_all(lower(text),"
                " '[a-z0-9]+', 0), 1, 2), ' ')"
            ),
            "UTF-8",
        ).alias("html"),
    )
    drop_dir = tempfile.mkdtemp(prefix="stream_state_src_")
    chk_dir = tempfile.mkdtemp(prefix="stream_state_chk_")
    out_dir = tempfile.mkdtemp(prefix="stream_state_out_")
    pages.repartition(4).write.mode("overwrite").parquet(drop_dir)

    stream_pages = (
        spark.readStream.schema("url string, html binary")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .load(drop_dir)
    )
    q = (
        stream_dedup(stream_pages)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(chk_dir, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select("host", "fp").distinct()


STREAM_DEDUP_STATEFUL_SQL = """
SELECT DISTINCT source AS host,
       md5(array_to_string(
         regexp_extract_all(lower(text), '[a-z0-9]+')[1:2], ' ')) AS fp
FROM documents
"""

def stream_dedup_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native streaming-dedup scale path under the oracle gate:
    dropDuplicates on (host, fp) keeps ONE O(1) state-store row per
    fingerprint (RocksDB-backed on a cluster) — same survivor set as
    the custom stateful operator, radically cheaper state.  Four
    micro-batches force real cross-batch state lookups."""
    from docwire_spark.streaming.dedup_stream import stream_dedup_native

    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/d/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(
            F.expr(
                "array_join(slice(regexp_extract_all(lower(text),"
                " '[a-z0-9]+', 0), 1, 2), ' ')"
            ),
            "UTF-8",
        ).alias("html"),
    )
    drop_dir = tempfile.mkdtemp(prefix="stream_native_src_")
    chk_dir = tempfile.mkdtemp(prefix="stream_native_chk_")
    out_dir = tempfile.mkdtemp(prefix="stream_native_out_")
    pages.repartition(4).write.mode("overwrite").parquet(drop_dir)

    stream_pages = (
        spark.readStream.schema("url string, html binary")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(drop_dir)
    )
    q = (
        stream_dedup_native(stream_pages)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(chk_dir, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select("host", "fp").distinct()


QUERIES = {
    "extract_stream_plain": extract_stream_plain,
    "stream_dedup_stateful": stream_dedup_stateful,
    "stream_dedup_native": stream_dedup_native,
}
ORACLES = {
    "extract_stream_plain": EXTRACT_STREAM_PLAIN_SQL,
    "stream_dedup_stateful": STREAM_DEDUP_STATEFUL_SQL,
    "stream_dedup_native": STREAM_DEDUP_STATEFUL_SQL,
}
