"""Bucketed-table helpers: the co-located-join layout for 10^12 docs.

Every corpus-keyed join in the engine (dedup verify/expand, posting
merges, doc-id attribute lookups) shuffles both sides on the key at
most once.  At cluster scale the right move is to pay that shuffle
ONCE at ingest by persisting the corpus BUCKETED on the join key:
every later join between tables bucketed the same way is planned
with zero Exchange on either side — Spark proves co-partitioning
from the bucket spec instead of shuffling to create it.

This is the persisted-table analog of the url-hash sharding the
extraction path already computes (spark/extract.py): the same
``bucket`` column that drives commit-group resume doubles as the
bucket key when the output is registered as a bucketed table.

Local note: bucketed tables need a catalog (``saveAsTable``); the
files land under ``spark.sql.warehouse.dir``.  Readers must not
disable ``spark.sql.sources.bucketing.enabled`` (on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "doc_id",
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on ``key``.

    ``n_buckets`` at real scale: pick so one bucket of the LARGEST
    co-located table fits an executor's sort buffer (e.g. 100 TB /
    65536 buckets ~ 1.6 GB); all tables that join on ``key`` must use
    the SAME bucket count or Spark falls back to shuffling the
    mismatched side."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str = "doc_id",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on ``key``; with matching bucket
    specs Catalyst plans this with no Exchange on either side."""
    return spark.table(left).join(spark.table(right), key, how)
