"""Corpus snapshot diff — incremental ingest's first question.

A recurring crawl produces snapshot N+1; the pipeline wants to
re-process ONLY what changed.  The diff classifies every doc_id
across two snapshots as added / removed / changed / unchanged by
content fingerprint — one full-outer equi-join on the id, comparing
md5(text).  At 10^12 docs this join is exactly what the bucketed
layout (spark/bucketing.py) exists for: both snapshots bucketed on
doc_id join with zero Exchange.

Snapshots are derived deterministically from the one documents table
in BOTH engines (same CASE arithmetic), so the oracle checks real
adds/removes/changes rather than an all-unchanged no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import load

#: membership/mutation rules (doc_id arithmetic, engine-identical)
OLD_DROP_MOD, OLD_DROP_REM = 11, 3   # absent from OLD -> "added"
NEW_DROP_MOD, NEW_DROP_REM = 13, 5   # absent from NEW -> "removed"
CHG_MOD, CHG_REM = 7, 2              # text mutated in NEW -> "changed"


def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents", parallelize=True)
    old = docs.filter(
        F.expr(f"doc_id % {OLD_DROP_MOD} <> {OLD_DROP_REM}")
    ).select("doc_id", F.md5("text").alias("fp_old"))
    new = docs.filter(
        F.expr(f"doc_id % {NEW_DROP_MOD} <> {NEW_DROP_REM}")
    ).select(
        "doc_id",
        F.md5(
            F.expr(
                f"CASE WHEN doc_id % {CHG_MOD} = {CHG_REM}"
                " THEN text || ' v2' ELSE text END"
            )
        ).alias("fp_new"),
    )
    j = old.join(new, "doc_id", "full_outer")
    return j.select(
        "doc_id",
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "removed")
        .when(F.col("fp_old") != F.col("fp_new"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


CORPUS_DIFF_SQL = f"""
WITH old AS (
  SELECT doc_id, md5(text) AS fp_old FROM documents
  WHERE doc_id % {OLD_DROP_MOD} <> {OLD_DROP_REM}
), new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {CHG_MOD} = {CHG_REM}
                  THEN text || ' v2' ELSE text END) AS fp_new
  FROM documents
  WHERE doc_id % {NEW_DROP_MOD} <> {NEW_DROP_REM}
)
SELECT doc_id,
       CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old <> fp_new THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new USING (doc_id)
"""


QUERIES = {"corpus_diff": corpus_diff}
ORACLES = {"corpus_diff": CORPUS_DIFF_SQL}
