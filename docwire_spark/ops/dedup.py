"""Deduplication operators over ``documents`` (and ``embeddings``).

Five dedup families, each as an oracle-checked query:

- ``dedup_exact``          hash-groupBy on the normalized-token md5
- ``dedup_minhash_lsh``    MinHash signatures -> banded LSH candidate
                           join -> exact-Jaccard verify (the scale
                           path: candidate generation is an equi-join
                           on band keys, never an all-pairs product)
- ``dedup_jaccard_exact``  brute-force n-gram Jaccard ground truth
                           (small-scale validation of the LSH recall;
                           O(n²) — do NOT run at full scale)
- ``dedup_simhash``        64-bit (60 used) SimHash signature per doc,
                           computed entirely map-side (no shuffle)
- ``dedup_simhash_pairs``  near-dup pairs by Hamming distance
- ``dedup_embedding``      embedding-cosine near-dup pairs

Hashes are md5-based so the DuckDB oracles implement the identical
spec (both engines produce the same lowercase-hex md5 of UTF-8
bytes).  MinHash min() is over hex strings — lexicographic order is
identical in both engines (pure ASCII).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from docwire_spark.ops.common import TOKENS_SQL, load, with_tokens

NUM_HASHES = 8
BAND_SIZE = 4
N_BANDS = NUM_HASHES // BAND_SIZE
JACCARD_THRESHOLD = 0.7
HAMMING_THRESHOLD = 12
COSINE_THRESHOLD = 0.3

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_tokens(load(spark, sf_dir, "documents"))
    return (
        docs.select(
            "doc_id", F.expr("md5(concat_ws(' ', tokens))").alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


DEDUP_EXACT_SQL = f"""
SELECT md5(array_to_string({TOKENS_SQL}, ' ')) AS fp,
       min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# MinHash + banded LSH -> verified Jaccard pairs
# ---------------------------------------------------------------------------

_MINHASH_EXPR = (
    f"transform(sequence(0, {NUM_HASHES - 1}), i ->"
    " array_min(transform(sh, s -> md5(concat(cast(i AS string), ':', s)))))"
)
_BANDS_EXPR = (
    f"transform(sequence(0, {N_BANDS - 1}), b -> md5(concat_ws('|',"
    f" element_at(mh, {BAND_SIZE} * b + 1), element_at(mh, {BAND_SIZE} * b + 2),"
    f" element_at(mh, {BAND_SIZE} * b + 3), element_at(mh, {BAND_SIZE} * b + 4))))"
)


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh): sorted distinct unigram shingle set per doc."""
    return with_tokens(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.array_sort(F.array_distinct("tokens")).alias("sh"),
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _shingled(spark, sf_dir)
    bands = (
        docs.withColumn("mh", F.expr(_MINHASH_EXPR))
        .select(
            "doc_id", "sh",
            F.posexplode(F.expr(_BANDS_EXPR)).alias("band", "key"),
        )
    )
    # candidate generation = shuffle on (band, key); at cluster scale
    # band-key buckets are small so the join output stays bounded.
    # The shingle sets ride along through the explode (sets are small;
    # this avoids two extra joins against the docs table), and a pair
    # matching in multiple bands is deduped before the jaccard verify.
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sha"),
            F.col("b.sh").alias("shb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = (
        cand.withColumn("n_inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.size("sha") + F.size("shb") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


DEDUP_MINHASH_SQL = f"""
WITH t AS (
  SELECT doc_id, list_sort(list_distinct({TOKENS_SQL})) AS sh FROM documents
),
mh AS (
  SELECT doc_id, sh,
         list_transform(generate_series(0, {NUM_HASHES - 1}),
           i -> list_min(list_transform(sh, s -> md5(i || ':' || s)))) AS m
  FROM t
),
bands AS (
  SELECT doc_id, b,
         md5(m[{BAND_SIZE} * b + 1] || '|' || m[{BAND_SIZE} * b + 2] || '|' ||
             m[{BAND_SIZE} * b + 3] || '|' || m[{BAND_SIZE} * b + 4]) AS key
  FROM mh, generate_series(0, {N_BANDS - 1}) g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key
                           AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         round(CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
               / (len(ta.sh) + len(tb.sh) - len(list_intersect(ta.sh, tb.sh))),
               6) AS jaccard
  FROM cand c
  JOIN t ta ON ta.doc_id = c.doc_a
  JOIN t tb ON tb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified
WHERE jaccard >= {JACCARD_THRESHOLD}
"""

# ---------------------------------------------------------------------------
# brute-force Jaccard (ground truth at small scale)
# ---------------------------------------------------------------------------


def dedup_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _shingled(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("n_inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.size("sha") + F.size("shb") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


DEDUP_JACCARD_SQL = f"""
WITH t AS (
  SELECT doc_id, list_sort(list_distinct({TOKENS_SQL})) AS sh FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
             6) AS jaccard
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
      >= {JACCARD_THRESHOLD}
"""

# ---------------------------------------------------------------------------
# SimHash (60-bit, from md5 of tokens with multiplicity)
# ---------------------------------------------------------------------------

# Spec: bit b (0..59) of a token's hash = bit b of the integer value
# of the first 15 md5 hex chars (equivalently: bit (b % 4) of the hex
# digit at 1-based position (15 - b div 4)).  simhash bit b is set iff
# the multiset-weighted ±1 vote over tokens is positive.
#
# Implemented as an Arrow-batched mapInPandas kernel (a "custom
# sketch" operator): Catalyst higher-order functions are interpreted
# per lambda step (~60 bits x n_tokens tree-walks per row), while the
# numpy bit-unpack below is two vectorized ops per document.  The
# DuckDB oracle implements the identical hex-digit spec in SQL.
from pyspark.sql.types import LongType, StructField, StructType

_SIMHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash", LongType())]
)


def _simhash_batches(iterator):
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    token_re = re.compile(r"[a-z0-9]+")
    bits = np.arange(60, dtype=np.uint64)

    def one(text: str) -> int:
        toks = token_re.findall((text or "").lower())
        if not toks:
            return 0
        hs = np.array(
            [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks],
            dtype=np.uint64,
        )
        votes = ((hs[:, None] >> bits) & 1).astype(np.int32)
        score = (2 * votes - 1).sum(axis=0)
        return int(((score > 0).astype(np.uint64) << bits).sum())

    for pdf in iterator:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "simhash": [one(t) for t in pdf["text"]],
            }
        )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(_simhash_batches, _SIMHASH_SCHEMA)


DEDUP_SIMHASH_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform({TOKENS_SQL}, t -> substr(md5(t), 1, 15)) AS hxs
  FROM documents
)
SELECT doc_id,
       CAST(list_sum(list_transform(generate_series(0, 59), b ->
         CASE WHEN list_sum(list_transform(hxs, h ->
                2 * (((strpos('0123456789abcdef',
                              substr(h, 15 - b // 4, 1)) - 1)
                      >> (b % 4)) & 1) - 1)) > 0
              THEN (1::BIGINT << b) ELSE 0::BIGINT END))
       AS BIGINT) AS simhash
FROM t
"""


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = dedup_simhash(spark, sf_dir)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
        .select("doc_a", "doc_b", "hamming")
    )


DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH s AS ({DEDUP_SIMHASH_SQL})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_THRESHOLD}
"""

# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn(
            "norm", F.expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))")
        )
    )
    a = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
    )
    cos = (
        "round(aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D,"
        " (acc, x) -> acc + x) / (qnorm * nnorm), 6)"
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", F.expr(cos))
        .filter(F.col("cos_sim") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", "cos_sim")
    )


DEDUP_EMBEDDING_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
           AS norm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_sum(list_transform(generate_series(1, 64),
                                     i -> a.v[i] * b.v[i]))
             / (a.norm * b.norm), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(generate_series(1, 64),
                                    i -> a.v[i] * b.v[i]))
            / (a.norm * b.norm), 6) >= {COSINE_THRESHOLD}
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_jaccard_exact": dedup_jaccard_exact,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_embedding": dedup_embedding,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_jaccard_exact": DEDUP_JACCARD_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_simhash_pairs": DEDUP_SIMHASH_PAIRS_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
}
