"""Distributed k-means over the embedding table (Lloyd's algorithm).

The iterative-ML shape on Spark: centroids are TINY (k x dim doubles)
and the points are huge, so each Lloyd iteration is one full scan
that assigns every point to its nearest centroid with the centroids
inlined as literals into the plan (the driver collects k rows per
iteration — the textbook MLlib topology; never the reverse, which
would shuffle the points).  Per-dimension means are computed with 64
codegen ``avg`` aggregates — map-side partial aggregation, one slim
shuffle of k*dim partial sums per iteration, no window, no explode.

Cross-engine determinism (the DuckDB oracle replays the same two
iterations in SQL CTEs):

- distances fold left-to-right from 0.0 in BOTH engines (Spark
  ``aggregate``, DuckDB ``list_reduce`` — adding 0.0 first is exact),
  over the same float->double element casts, so per-pair distances
  are bit-identical;
- ties in argmin break on the lower centroid id in both plans;
- recomputed centroids pass through ``round(avg, 9)``: group-sum
  ordering may differ between engines in the last ULP, and the round
  collapses that before the next iteration's comparisons;
- the output carries integer statistics only (counts, id sums) —
  no floats to hash.

ITERS is fixed at 2 so the oracle stays a static SQL string; the
builder generalizes by parameter for real use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import load

K = 10
DIM = 64
ITERS = 2


def _assign(vecs: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Add ``cluster`` = argmin_c dist(emb, c), ties to lower cid.

    Centroids are plan literals — the broadcast-of-small-side analog
    for expression evaluation; the scan streams, nothing shuffles."""
    dist_structs = []
    for cid, cvec in cents:
        arr = F.array(*[F.lit(float(x)) for x in cvec])
        d = F.aggregate(
            F.zip_with("emb", arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0).cast("double"),
            lambda s, x: s + x,
        )
        dist_structs.append(F.struct(d.alias("d"), F.lit(cid).alias("cid")))
    best = F.array_sort(F.array(*dist_structs))[0]["cid"]
    return vecs.withColumn("cluster", best)


def _recompute(assigned: DataFrame) -> list[tuple[int, list[float]]]:
    """k rows of 64 rounded per-dimension means, collected to driver."""
    rows = (
        assigned.groupBy("cluster")
        .agg(*[
            F.round(F.avg(F.col("emb")[i]), 9).alias(f"m{i}")
            for i in range(DIM)
        ])
        .collect()
    )
    return sorted(
        (int(r["cluster"]), [r[f"m{i}"] for i in range(DIM)]) for r in rows
    )


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations from deterministic seeds (vec_id < K);
    returns integer per-cluster statistics."""
    vecs = (
        load(spark, sf_dir, "embeddings", parallelize=True)
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            .alias("emb"),
        )
    )
    seeds = (
        vecs.filter(F.col("vec_id") < K)
        .orderBy("vec_id")
        .collect()
    )
    cents = [(int(r["vec_id"]), list(r["emb"])) for r in seeds]
    assigned = None
    for _ in range(ITERS):
        assigned = _assign(vecs, cents)
        cents = _recompute(assigned)
    return (
        assigned.groupBy(F.col("cluster").cast("int").alias("cluster_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
            F.min("vec_id").cast("bigint").alias("min_vec_id"),
        )
    )


def _dist_sql(emb: str, cvec: str) -> str:
    # left fold from 0.0 — mirrors Spark's aggregate exactly
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, {DIM + 1}),"
        f" i -> ({emb}[i] - {cvec}[i]) * ({emb}[i] - {cvec}[i]))),"
        " (s, x) -> s + x)"
    )


KMEANS_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, emb AS cvec FROM v WHERE vec_id < {K}
), d1 AS (
  SELECT v.vec_id, c0.cid, {_dist_sql('v.emb', 'c0.cvec')} AS dist
  FROM v CROSS JOIN c0
), a1 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1
  ) WHERE rn = 1
), m1 AS (
  SELECT a1.cluster AS cid, u.i AS dim, round(avg(v.emb[u.i]), 9) AS m
  FROM a1 JOIN v USING (vec_id), unnest(range(1, {DIM + 1})) AS u(i)
  GROUP BY a1.cluster, u.i
), c1 AS (
  SELECT cid, list(m ORDER BY dim) AS cvec FROM m1 GROUP BY cid
), d2 AS (
  SELECT v.vec_id, c1.cid, {_dist_sql('v.emb', 'c1.cvec')} AS dist
  FROM v CROSS JOIN c1
), a2 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2
  ) WHERE rn = 1
)
SELECT CAST(cluster AS INTEGER) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(vec_id) AS BIGINT) AS sum_vec_id,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id
FROM a2 GROUP BY cluster
"""


QUERIES = {"kmeans_embeddings": kmeans_embeddings}
ORACLES = {"kmeans_embeddings": KMEANS_SQL}
