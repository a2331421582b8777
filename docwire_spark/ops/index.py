"""Distributed inverted index with bucketed (segmented) posting lists.

``inverted_index`` builds the search-engine core structure over the
corpus: for every token, the sorted list of documents containing it
plus document/term frequencies.  The posting list for a hot token
(a stopword at web scale appears in ~every document) is O(corpus), so
a single ``collect_list`` per token is exactly the unbounded-state
aggregation that dies at 10^12 docs.  The scale-correct layout — the
one segment-based search engines actually shard — is SEGMENTED
postings: the key is ``(token, bucket)`` where ``bucket = doc_id div
BUCKET_DOCS``, so every aggregation group is bounded by the bucket
width regardless of how hot the token is, segments of one token land
on different reducers (hot-key skew turns into even spread by
construction), and a reader streams a token's postings by scanning
its buckets in order.

Plan shape: explode -> partial-aggregated (token, doc) tf count ->
one shuffle on (token, bucket) with bounded per-group state.  No
windows, no broadcast, no corpus-sized group anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import TOKENS_SQL, load, with_tokens

#: posting-list segment width in doc_ids; at 10^12 docs pick ~1e6 so a
#: segment row stays a few MB even for a token present in every doc
BUCKET_DOCS = 100


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (token, posting segment).

    ``postings`` is the comma-joined ascending doc_id list within the
    segment — bounded by BUCKET_DOCS, so collect_list state is bounded
    no matter how frequent the token is corpus-wide."""
    docs = with_tokens(load(spark, sf_dir, "documents", parallelize=True))
    occ = docs.select("doc_id", F.explode("tokens").alias("token"))
    tf = occ.groupBy("token", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    seg = tf.withColumn(
        "bucket", F.expr(f"CAST(doc_id DIV {BUCKET_DOCS} AS BIGINT)")
    )
    return seg.groupBy("token", "bucket").agg(
        F.count("*").cast("bigint").alias("df_bucket"),
        F.sum("tf").cast("bigint").alias("tf_bucket"),
        F.array_join(
            F.expr("transform(sort_array(collect_list(doc_id)),"
                   " d -> CAST(d AS STRING))"),
            ",",
        ).alias("postings"),
    )


INVERTED_INDEX_SQL = f"""
WITH t AS (
  SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents
), occ AS (
  SELECT doc_id, unnest(tokens) AS token FROM t
), tf AS (
  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM occ GROUP BY token, doc_id
)
SELECT token,
       CAST(doc_id // {BUCKET_DOCS} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS df_bucket,
       CAST(sum(tf) AS BIGINT) AS tf_bucket,
       array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',')
         AS postings
FROM tf
GROUP BY token, bucket
"""


QUERIES = {"inverted_index": inverted_index}
ORACLES = {"inverted_index": INVERTED_INDEX_SQL}
