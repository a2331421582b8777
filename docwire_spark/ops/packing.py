"""GPT-style sequence packing: map every document into the contiguous
token stream a trainer consumes.

Training pipelines concatenate the cleaned corpus into one token
stream and cut it into fixed-length sequences (SEQ_LEN); the packing
table — for each document, which sequence it starts in, at which
offset, and how many sequences it spans — is what a data loader
shards by.  The core computation is an exclusive PREFIX SUM of token
counts in a deterministic document order.

A naive window (``ORDER BY doc_id`` with no partition) computes that
prefix sum on ONE task — the classic accidental serialization.  This
implements the scalable two-phase form instead:

1. within-bucket running sums, partitioned by ``bucket = doc_id DIV
   BUCKET``, groups bounded by BUCKET;
2. per-bucket totals (tiny table) get their own exclusive running sum
   — the only ordered window runs over #buckets rows, corpus/BUCKET
   (recurse the same trick if even that is too big);
3. join the bucket offset back and add.

All arithmetic is BIGINT, so the packing is bit-identical across
engines and partitionings.  The DuckDB oracle states the spec with
the naive global window — oracles say WHAT, plans decide HOW.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import TOKENS_SQL, load, with_tokens

SEQ_LEN = 2048
BUCKET = 1000


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = with_tokens(
        load(spark, sf_dir, "documents", parallelize=True)
    ).select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tok"),
        F.expr(f"CAST(doc_id DIV {BUCKET} AS BIGINT)").alias("bkt"),
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = docs.withColumn(
        "intra", F.coalesce(F.sum("n_tok").over(w_in), F.lit(0)).cast("bigint")
    )
    w_b = (
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    # the only unpartitioned window: one row per BUCKET of documents
    boff = (
        docs.groupBy("bkt")
        .agg(F.sum("n_tok").cast("bigint").alias("btot"))
        .withColumn(
            "boff",
            F.coalesce(F.sum("btot").over(w_b), F.lit(0)).cast("bigint"),
        )
        .select("bkt", "boff")
    )
    packed = intra.join(boff, "bkt").withColumn(
        "cum_before", (F.col("boff") + F.col("intra")).cast("bigint")
    )
    return packed.select(
        "doc_id",
        "n_tok",
        F.expr(f"CAST(cum_before DIV {SEQ_LEN} AS BIGINT)").alias("seq_id"),
        F.expr(f"CAST(cum_before % {SEQ_LEN} AS BIGINT)").alias("seq_offset"),
        F.expr(
            "CAST(CASE WHEN n_tok = 0 THEN 0 ELSE"
            f" (cum_before + n_tok - 1) DIV {SEQ_LEN}"
            f" - cum_before DIV {SEQ_LEN} + 1 END AS BIGINT)"
        ).alias("n_seqs_spanned"),
    )


PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({TOKENS_SQL}) AS BIGINT) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         CAST(coalesce(sum(n_tok) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, n_tok,
       CAST(cum_before // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(cum_before % {SEQ_LEN} AS BIGINT) AS seq_offset,
       CAST(CASE WHEN n_tok = 0 THEN 0 ELSE
            (cum_before + n_tok - 1) // {SEQ_LEN}
            - cum_before // {SEQ_LEN} + 1 END AS BIGINT)
         AS n_seqs_spanned
FROM c
"""


SHARD_SIZE = 128
_SHUFFLE_KEY = "md5('s42:' || CAST(doc_id AS {s}))"


def train_shuffle_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: every doc gets a
    (shard, pos_in_shard) slot under a pseudo-random permutation —
    the order a data loader will stream, reproducible across reruns
    because the key is ``md5(salt:doc_id)``, not ``rand()``.

    The global rank under the shuffled order is the same two-phase
    prefix-sum shape as ``pack_sequences``, with one structural
    advantage unique to shuffling: the bucket IS the first two bytes
    of the hash key, so buckets are uniform BY CONSTRUCTION — no
    range sampling, no skew handling, the cross-bucket phase is an
    exact 65536-row problem at any corpus size, and per-bucket
    windows hold corpus/65536 rows (~15M at 10^12 docs).  A plain
    ``orderBy(key)`` would need Spark's range-sampling pass over the
    full corpus to find balanced boundaries; the hash prefix makes
    the boundaries free.  All arithmetic BIGINT-exact, so shard
    layouts are bit-identical across engines and partitionings."""
    from pyspark.sql import Window

    keyed = load(spark, sf_dir, "documents", parallelize=True).selectExpr(
        "doc_id",
        _SHUFFLE_KEY.format(s="STRING") + " AS skey",
    ).withColumn("bkt", F.expr("CAST(conv(substr(skey, 1, 4), 16, 10)"
                               " AS BIGINT)"))
    w_in = Window.partitionBy("bkt").orderBy("skey", "doc_id")
    intra = keyed.withColumn(
        "intra", F.row_number().over(w_in).cast("bigint")
    )
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = (
        keyed.groupBy("bkt")
        .agg(F.count("*").cast("bigint").alias("btot"))
        .withColumn(
            "boff",
            F.coalesce(F.sum("btot").over(w_b), F.lit(0)).cast("bigint"),
        )
        .select("bkt", "boff")
    )
    ranked = intra.join(boff, "bkt").withColumn(
        "rank", (F.col("boff") + F.col("intra") - 1).cast("bigint")
    )
    return ranked.select(
        "doc_id",
        F.expr(f"CAST(rank DIV {SHARD_SIZE} AS BIGINT)").alias("shard"),
        F.expr(f"CAST(rank % {SHARD_SIZE} AS BIGINT)").alias("pos_in_shard"),
    )


_DUCK_KEY = _SHUFFLE_KEY.format(s="VARCHAR")
TRAIN_SHUFFLE_EXPORT_SQL = f"""
WITH r AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY {_DUCK_KEY}, doc_id) - 1
              AS BIGINT) AS rank
  FROM documents
)
SELECT doc_id,
       CAST(rank // {SHARD_SIZE} AS BIGINT) AS shard,
       CAST(rank % {SHARD_SIZE} AS BIGINT) AS pos_in_shard
FROM r
"""


QUERIES = {
    "pack_sequences": pack_sequences,
    "train_shuffle_export": train_shuffle_export,
}
ORACLES = {
    "pack_sequences": PACK_SEQUENCES_SQL,
    "train_shuffle_export": TRAIN_SHUFFLE_EXPORT_SQL,
}
