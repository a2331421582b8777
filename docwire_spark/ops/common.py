"""Shared helpers for the ops layer.

Tokenization spec (identical in Spark and the DuckDB oracles):
``tokens = regexp_extract_all(lower(text), '[a-z0-9]+')`` — ASCII
alnum runs over lowercased text.  Chosen because it is expressible
bit-identically in both engines (RE2 and Java regex agree on this
pattern class).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Spark SQL expression producing the token array from a `text` column.
TOKENS_EXPR = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
#: Same tokenizer in DuckDB (group index defaults to 0 there).
TOKENS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"

#: GPT2-style coarse pre-tokenizer: letter runs | single digits | punct.
BPE_EXPR = "regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]', 0)"
BPE_SQL = "regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def with_tokens(df: DataFrame, distinct: bool = False) -> DataFrame:
    out = df.withColumn("tokens", F.expr(TOKENS_EXPR))
    if distinct:
        out = out.withColumn("tokens", F.array_distinct(F.col("tokens")))
    return out
