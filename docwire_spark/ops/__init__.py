"""Training-data pipeline operators around the extraction engine.

Each module exposes ``QUERIES`` (name -> fn(spark, sf_dir) -> DataFrame)
and ``ORACLES`` (name -> DuckDB ANSI-SQL string over the pre-registered
testdata views).  The two are independent implementations of the same
spec — the DuckDB SQL is the correctness oracle for the Spark job.
"""
