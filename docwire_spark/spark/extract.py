"""The distributed extraction job.

Pipeline (north-rule shape):

    pages(url, warc_ts, html, text, lang)
      -> byte-bounded scan splits (maxPartitionBytes; no pre-shuffle —
         url-hash sharding is the computed ``bucket`` column, applied
         physically at the commit boundary; opt-in repartition for
         pathological inputs)
         [optional oversize split: length(html) > threshold -> own branch]
      -> mapInArrow(extract_batch)    # Arrow batches, no per-row Python
      -> union(oversize branch)
      -> results(url, mime, mime_confidence, extracted_text, spans,
                 meta, error, n_events, bytes_in, partition_id, bucket)
      -> metrics = groupBy(partition_id) aggregation
      -> checkpointed idempotent write sharded by bucket (lineage.py)

Skew handling: a host-level salt key helper for host-grouped
operations (extraction itself shards by url hash, which is uniform;
hosts are only skewed when you group by them).

Scale notes (100 TB posture):
- only ``html`` + ``url`` are read by the extraction scan (column
  pruning: select before mapInArrow so parquet never materializes
  unused columns)
- oversized rows: uniformly spread by the url-hash shuffle by default;
  the opt-in oversize branch isolates extreme rows on their own full
  shard fanout when the size distribution demands it (see
  extract_pages docstring for the measured cost rationale)
- mapInArrow streams batches; per-batch Python cost is amortized over
  the Arrow transfer (no per-row pickling)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

OVERSIZE_BYTES = 262_144  # 256 KiB: rows above this get the low-fanout branch
DEFAULT_SHARDS = 128

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("start", LongType()),
            StructField("end", LongType()),
            StructField("kind", StringType()),
        ]
    )
)

_BASE_FIELDS = [
    StructField("url", StringType()),
    StructField("mime", StringType()),
    StructField("mime_confidence", StringType()),
    StructField("extracted_text", StringType()),
    StructField("spans", SPAN_TYPE),
    StructField("meta_json", StringType()),
    StructField("error", StringType()),
    StructField("n_events", IntegerType()),
    StructField("bytes_in", LongType()),
    StructField("partition_id", IntegerType()),
    StructField("bucket", IntegerType()),
]

RESULT_SCHEMA = StructType(_BASE_FIELDS)
RESULT_SCHEMA_BINARY = StructType(
    _BASE_FIELDS[:4] + [StructField("extracted_bytes", BinaryType())]
    + _BASE_FIELDS[4:]
)


#: exporter name -> result column (reference html_writer /
#: meta_data_writer / csv_writer renders, SURVEY.md §2.5)
EXPORT_COLUMNS = {
    "html": "extracted_html",
    "meta_text": "meta_text",
    "csv": "table_csv",
}


def _result_schema(
    with_binary: bool, with_main_content: bool, exports: tuple = ()
) -> StructType:
    base = RESULT_SCHEMA_BINARY if with_binary else RESULT_SCHEMA
    fields = list(base.fields)
    at = next(
        i for i, f in enumerate(fields) if f.name == "extracted_text"
    ) + 1
    if with_main_content:
        fields.insert(at, StructField("main_content", StringType()))
        at += 1
    for name in exports:
        fields.insert(at, StructField(EXPORT_COLUMNS[name], StringType()))
        at += 1
    return StructType(fields)


#: pyarrow types per result column (must mirror RESULT_SCHEMA)
_PA_SPAN = None  # built lazily on the executor (pyarrow import)


def _pa_types():
    import pyarrow as pa

    span = pa.list_(pa.struct([
        pa.field("start", pa.int64()),
        pa.field("end", pa.int64()),
        pa.field("kind", pa.string()),
    ]))
    return {
        "url": pa.string(), "mime": pa.string(),
        "mime_confidence": pa.string(), "extracted_text": pa.string(),
        "extracted_bytes": pa.binary(), "main_content": pa.string(),
        "extracted_html": pa.string(), "meta_text": pa.string(),
        "table_csv": pa.string(), "spans": span, "meta_json": pa.string(),
        "error": pa.string(), "n_events": pa.int32(),
        "bytes_in": pa.int64(), "partition_id": pa.int32(),
        "bucket": pa.int32(),
    }


def _make_extract_batches(
    with_binary: bool,
    with_main_content: bool = False,
    exports: tuple = (),
    counters: dict | None = None,
):
    """mapInArrow body factory: runs the pure-Python kernel per Arrow
    RecordBatch.  Arrow in/out directly (round 3: measured ~8% faster
    than the former mapInPandas path — the kernel needs Python bytes
    either way, but the pandas Series wrappers and the
    DataFrame->Arrow conversion of the wide result are pure
    overhead).  ``extracted_bytes`` is only materialized when
    requested — emitting it unconditionally doubles the Arrow transfer
    per row and the JVM-side conversion cost, which at high task
    concurrency starves the python workers (measured 4x end-to-end
    slowdown on the oversized-row branch).

    Imports live inside so the function ships cleanly to executors via
    --py-files.
    """
    col_names = [
        f.name for f in _result_schema(with_binary, with_main_content,
                                       exports).fields
    ]

    def _extract_batches(iterator):
        import pyarrow as pa
        from pyspark import TaskContext

        from docwire_spark.kernel.api import extract

        pa_types = _pa_types()
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1

        for batch in iterator:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            n = len(urls)
            # bucket is computed JVM-side on the NARROW input (url
            # only) and passed through as the original Arrow array —
            # zero conversion cost
            names = batch.schema.names
            bucket_arr = (
                batch.column("bucket").cast(pa.int32())
                if "bucket" in names else pa.nulls(n, pa.int32())
            )
            out = {
                "mime": [],
                "mime_confidence": [],
                "extracted_text": [],
                "main_content": [],
                "extracted_bytes": [],
                "spans": [],
                "meta_json": [],
                "error": [],
                "n_events": [],
                "bytes_in": [],
            }
            for name in exports:
                out[EXPORT_COLUMNS[name]] = []
            if not with_binary:
                del out["extracted_bytes"]
            if not with_main_content:
                del out["main_content"]
            for url, html in zip(urls, htmls):
                data = html if html is not None else b""
                res = extract(
                    data, url=url or "",
                    want_main_content=with_main_content,
                    exports=exports,
                )
                out["mime"].append(res.mime)
                out["mime_confidence"].append(res.mime_confidence)
                out["extracted_text"].append(
                    res.text.decode("utf-8", "replace")
                )
                if with_main_content:
                    out["main_content"].append(res.main_content)
                for name in exports:
                    rendered = getattr(
                        res, {"html": "html", "meta_text": "meta_text",
                              "csv": "csv"}[name]
                    )
                    out[EXPORT_COLUMNS[name]].append(
                        rendered.decode("utf-8", "replace")
                        if rendered is not None else None
                    )
                if with_binary:
                    out["extracted_bytes"].append(res.text)
                out["spans"].append(
                    [
                        {"start": s, "end": e, "kind": k}
                        for s, e, k in res.spans
                    ]
                )
                out["meta_json"].append(
                    json.dumps(res.meta, default=str, sort_keys=True)
                    if res.meta
                    else None
                )
                out["error"].append(res.error)
                out["n_events"].append(res.n_events)
                out["bytes_in"].append(len(data))
            if counters is not None:  # one update per Arrow batch
                counters["docs"].add(n)
                counters["bytes"].add(sum(out["bytes_in"]))
                counters["failed"].add(
                    sum(1 for e in out["error"] if e is not None)
                )
            arrays = []
            for cname in col_names:
                if cname == "url":
                    arrays.append(batch.column("url").cast(pa.string()))
                elif cname == "partition_id":
                    arrays.append(
                        pa.array([pid] * n, pa.int32())
                    )
                elif cname == "bucket":
                    arrays.append(bucket_arr)
                else:
                    arrays.append(pa.array(out[cname], pa_types[cname]))
            yield pa.RecordBatch.from_arrays(arrays, col_names)

    return _extract_batches


# default-shape body (no binary column) for callers that import it
_extract_batches = _make_extract_batches(with_binary=False)


def extract_pages(
    pages: DataFrame,
    n_shards: int = DEFAULT_SHARDS,
    oversize_bytes: int | None = None,
    with_binary: bool = False,
    with_main_content: bool = False,
    exports: tuple = (),
    shuffle: bool = False,
    counters: dict | None = None,
) -> DataFrame:
    """Run the extraction pipeline; returns the results DataFrame.

    ``bucket`` is a deterministic url-hash bucket (stable across runs
    and cluster sizes) used by the checkpointed writer for resume.

    url-hash sharding is LOGICAL by default: the bucket is a computed
    column (pmod(xxhash64(url), n_shards)) and the commit boundary
    (CheckpointedWriter) shards on it — no physical pre-shuffle.  The
    parquet/Iceberg scan already yields byte-bounded splits
    (maxPartitionBytes), which balances per-task extraction cost
    BETTER than row-count-balanced hash shards, and it never moves the
    raw html bytes across the cluster (measured: the 1.9 GB shuffle of
    a 600k-doc corpus cost more wall time than the entire 16-core
    extraction; at 100 TB the pre-shuffle would be the single largest
    I/O in the job).  Pass ``shuffle=True`` to force the physical
    repartition when the input's partitioning is pathological (a few
    giant unsplittable files, or severely size-skewed splits).

    Oversized-row handling: scan splits spread the rare giant rows by
    byte budget already.  Pass ``oversize_bytes`` to additionally
    route rows above the threshold through their own branch (a second
    scan + filter) when the size distribution is so extreme that one
    row dominates an Arrow batch.
    """
    src = pages.select(
        "url", "html",
        F.pmod(F.xxhash64(F.col("url")), F.lit(n_shards))
        .cast("int").alias("bucket"),
    )
    schema = _result_schema(with_binary, with_main_content, exports)
    batch_fn = _make_extract_batches(
        with_binary, with_main_content, exports, counters
    )

    if oversize_bytes is None:
        sharded = (
            src.repartition(n_shards, F.xxhash64(F.col("url")))
            if shuffle else src
        )
        extracted = sharded.mapInArrow(batch_fn, schema)
    else:
        # coalesce: NULL html must not evaporate from both branches
        # (NULL predicate is neither true nor false) — it belongs in
        # the normal branch (error/empty-text path of the kernel)
        is_oversized = (
            F.coalesce(F.length(F.col("html")), F.lit(0))
            > F.lit(oversize_bytes)
        )
        normal = src.filter(~is_oversized)
        # oversized rows are individually 50-100x more expensive to
        # parse: spread the FEW of them over the full shard budget so
        # no task accumulates a fat tail (this branch is tiny, so its
        # repartition moves almost no bytes)
        oversized = src.filter(is_oversized).repartition(
            n_shards, F.xxhash64(F.col("url"))
        )
        if shuffle:
            normal = normal.repartition(n_shards, F.xxhash64(F.col("url")))
        extracted = normal.mapInArrow(batch_fn, schema).unionByName(
            oversized.mapInArrow(batch_fn, schema)
        )

    return extracted


def salted_host_key(df: DataFrame, host_col: str = "host",
                    skew_threshold: int = 10_000, salt_buckets: int = 16,
                    url_col: str = "url") -> DataFrame:
    """Add a deterministic ``salted_host`` key for host-grouped work.

    Hosts with more than ``skew_threshold`` rows get ``salt_buckets``
    sub-keys (salt = xxhash64(url) % k, no randomness -> reproducible).
    The skew map is tiny (only hot hosts) and broadcast.
    """
    counts = (
        df.groupBy(host_col)
        .count()
        .filter(F.col("count") > skew_threshold)
        .select(host_col, F.lit(salt_buckets).alias("k_host"))
    )
    out = df.join(F.broadcast(counts), on=host_col, how="left")
    salt = F.when(
        F.col("k_host").isNotNull(),
        F.pmod(F.xxhash64(F.col(url_col)), F.col("k_host")),
    ).otherwise(F.lit(0))
    return out.withColumn(
        "salted_host", F.concat_ws("#", F.col(host_col), salt.cast("string"))
    ).drop("k_host")


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("host", F.parse_url(F.col(url_col), F.lit("HOST")))


def metrics_by_partition(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage/metrics rows (reference analog:
    message_counters, here aggregated JVM-side by Catalyst)."""
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("error").isNull(), 1).otherwise(0)).alias("n_ok"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_failed"
            ),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("partition_id")
    )
