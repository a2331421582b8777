"""Hashed linear classifier inference — fastText-style quality
scoring as a pure Catalyst expression.

The production pattern for corpus-scale model inference with a linear
model over hashed token features (fastText, vowpal-wabbit, the quality
classifiers used to filter CC-scale pretraining data): every token
hashes into one of D weight buckets, the document score is the sum of
its tokens' bucket weights, and the label is a threshold on the score.
Done right, the entire forward pass is ONE map-side codegen expression
— no Python, no shuffle, no join: the "model" rides inside the
executor as arithmetic, so inference throughput equals scan
throughput.  At 10^12 documents that is the difference between a
pass that pipelines into the extraction scan and a pass that owns the
cluster for a day.

Here the weight of bucket ``b`` is the deterministic integer
``(b * 2654435761) % 1001 - 500`` (Knuth multiplicative mix), standing
in for trained weights; swapping in a real model means replacing that
expression with a lookup into a D-element literal array (D = 4096
fits comfortably in codegen) — the plan shape does not change.  All
arithmetic is BIGINT-exact, so scores are bit-identical across
engines, partitionings, and row orders — which is exactly what lets
DuckDB replay the full forward pass as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import hash_expr
from .common import load

#: weight buckets (feature-hash space) — production D is 1e5-1e6;
#: 4096 keeps the oracle cheap while exercising real collisions
N_BUCKETS = 4096

#: NULL text scores as the empty document in BOTH engines (without
#: the coalesce, Spark's aggregate over a NULL array yields NULL
#: score/label while the oracle's coalesce yields 0 — a cross-engine
#: divergence on the first real corpus with a NULL text)
_TOK = "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'{idx})"
_TOK_SPARK = _TOK.format(idx=", 0")
_TOK_DUCK = _TOK.format(idx="")


def _weight_lambda() -> str:
    """token -> bucket -> integer weight, as a SQL lambda body valid
    in BOTH Spark SQL and DuckDB (md5 slice fold + Knuth mix)."""
    bucket = hash_expr("t", 0, N_BUCKETS)
    return f"(({bucket}) * 2654435761) % 1001 - 500"


def ml_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no parallelize= repartition: the forward pass is cheap codegen,
    # so the scan's own byte-bounded splits are the right parallelism
    # and the plan stays Exchange-free (gated in tests)
    docs = load(spark, sf_dir, "documents")
    w = _weight_lambda()
    return docs.selectExpr(
        "doc_id",
        f"{_TOK_SPARK} AS tokens",
    ).selectExpr(
        "doc_id",
        "CAST(size(tokens) AS BIGINT) AS n_tok",
        "CAST(aggregate(transform(tokens, t -> " + w + "),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)"
        " AS score_int",
    ).selectExpr(
        "doc_id", "n_tok", "score_int",
        "CAST(score_int > 0 AS INT) AS label",
    )


ML_QUALITY_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOK_DUCK} AS tokens
  FROM documents
)
SELECT doc_id,
       CAST(len(tokens) AS BIGINT) AS n_tok,
       CAST(coalesce(list_sum(list_transform(tokens, t -> {_weight_lambda()})), 0)
            AS BIGINT) AS score_int,
       CAST(CAST(coalesce(list_sum(list_transform(tokens, t -> {_weight_lambda()})), 0)
            AS BIGINT) > 0 AS INT) AS label
FROM t
"""


QUERIES = {"ml_quality_score": ml_quality_score}
ORACLES = {"ml_quality_score": ML_QUALITY_SCORE_SQL}
