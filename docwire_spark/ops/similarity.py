"""Similarity search over the ``embeddings`` table (array<float> column).

- ``similarity_topk``: brute-force cosine top-k for a fixed query set.
  The query side is tiny and broadcast; the scan side streams — the
  canonical "exact" baseline.
- ``similarity_ann_lsh``: random-hyperplane LSH variant (the scale
  path): 8 deterministic ±1 hyperplanes -> 8 sign bits -> bucket id;
  candidates are co-bucketed rows only.  At cluster scale the bucket
  id is the shuffle key, so each bucket's top-k is a local problem —
  no all-pairs shuffle.

All arithmetic uses built-in higher-order functions (``zip_with`` /
``aggregate``) over ``array<double>`` — JVM-side, sequential left
fold, so the DuckDB oracle reproduces results bit-for-bit (both
engines do IEEE-754 double ops over identical float32 inputs in the
same order).  Scores are additionally rounded to 6 decimals and the
rounded value is used for ranking so ordering is stable across
engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from docwire_spark.ops.common import load

DIM = 64
N_PLANES = 8
TOPK = 10
LSH_TOPK = 5
N_QUERIES = 10
LSH_N_QUERIES = 20


def _plane_weights() -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign from md5('{p}_{d}') nibble.

    Computed driver-side once and embedded as a literal in both the
    Spark plan and the DuckDB oracle, so no engine-specific hashing is
    involved.
    """
    return [
        [
            1 if int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[0], 16) < 8
            else -1
            for d in range(DIM)
        ]
        for p in range(N_PLANES)
    ]


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn(
            "norm", F.expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))")
        )
    )


_COS = (
    "round(aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D,"
    " (acc, x) -> acc + x) / (qnorm * nnorm), 6)"
)


def topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vectors(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cands = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.expr(_COS))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))"
)

TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
           AS norm
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_DOT_SQL} / (a.norm * b.norm), 6) AS cos_sim
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id)
            AS BIGINT) AS rank,
       cos_sim
FROM scored
QUALIFY rank <= {TOPK}
"""


def _with_bucket(vecs: DataFrame) -> DataFrame:
    # one flat zip_with per plane (a nested per-element lookup into the
    # 8x64 literal matrix re-evaluates the array construction per
    # lambda step — O(dim * planes * dim) per row; this is O(dim) each)
    out = vecs
    bucket = F.lit(0).cast("bigint")
    for p, row in enumerate(_plane_weights()):
        w_lit = "array(" + ",".join(str(w) for w in row) + ")"
        out = out.withColumn(
            f"_proj_{p}",
            F.expr(
                f"aggregate(zip_with(v, {w_lit}, (x, w) -> x * w), 0D,"
                " (acc, x) -> acc + x)"
            ),
        )
        bucket = bucket + F.when(
            F.col(f"_proj_{p}") > 0, F.lit(2 ** p)
        ).otherwise(F.lit(0)).cast("bigint")
    return out.withColumn("bucket", bucket).drop(
        *[f"_proj_{p}" for p in range(N_PLANES)]
    )


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _with_bucket(_vectors(spark, sf_dir))
    queries = vecs.filter(F.col("vec_id") < LSH_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    cands = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
        "bucket",
    )
    # equi-join on bucket: at scale this is the shuffle key (each LSH
    # bucket's candidates co-locate); query side is small -> broadcast
    scored = (
        cands.join(F.broadcast(queries), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.expr(_COS))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= LSH_TOPK)
        .select("query_id", "bucket", "neighbor_id", "rank", "cos_sim")
    )


def _ann_lsh_sql() -> str:
    values = ",".join(
        "(" + str(p) + ", [" + ",".join(str(w) for w in row) + "])"
        for p, row in enumerate(_plane_weights())
    )
    return f"""
WITH w(p, wts) AS (VALUES {values}),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
           AS norm
  FROM embeddings
),
proj AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN list_sum(list_transform(
                          generate_series(1, {DIM}), i -> v[i] * wts[i])) > 0
                       THEN (1::BIGINT << p) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM e, w GROUP BY vec_id
),
bucketed AS (
  SELECT e.vec_id, e.v, e.norm, proj.bucket
  FROM e JOIN proj ON e.vec_id = proj.vec_id
),
scored AS (
  SELECT a.vec_id AS query_id, a.bucket AS bucket, b.vec_id AS neighbor_id,
         round({_DOT_SQL} / (a.norm * b.norm), 6) AS cos_sim
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {LSH_N_QUERIES}
)
SELECT query_id, bucket, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id)
            AS BIGINT) AS rank,
       cos_sim
FROM scored
QUALIFY rank <= {LSH_TOPK}
"""


QUERIES = {
    "similarity_topk": topk_bruteforce,
    "similarity_ann_lsh": ann_lsh,
}

ORACLES = {
    "similarity_topk": TOPK_SQL,
    "similarity_ann_lsh": _ann_lsh_sql(),
}
