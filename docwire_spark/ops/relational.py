"""The relational shell around the extraction UDFs (SURVEY.md §2.6).

DocWire itself has no relational operators; in the Spark build the
relational work — metrics aggregation, skew detection for salting,
dimension joins — is all built-in Catalyst.  These queries demonstrate
that shell with oracle checks:

- ``events_by_type``     hash aggregation with partial (map-side)
                         combine; distinct-count
- ``source_skew_salt``   the skew-detection half of the salting plan
                         (hot keys get k salt buckets; the broadcast
                         salt map in extract.salted_host_key)
- ``orders_by_nation``   broadcast-dim join (nation/customer are small
                         dims; lineage: orders JOIN customer JOIN
                         nation with nation broadcast)
- ``pricing_summary``    TPC-H Q1-shaped scan-heavy aggregation with a
                         pushed-down timestamp predicate

Double sums are rounded (2 decimals) because summation order across
partitions is not deterministic; the integer-exact columns are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from docwire_spark.ops.common import load

SKEW_THRESHOLD = 20
SALT_BUCKETS = 8


def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


EVENTS_BY_TYPE_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(sum(value), 2) AS sum_value,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY event_type
"""


def source_skew_salt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "salt_buckets",
            F.when(F.col("n_docs") > SKEW_THRESHOLD, F.lit(SALT_BUCKETS))
            .otherwise(F.lit(1))
            .cast("bigint"),
        )
    )


SOURCE_SKEW_SQL = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(CASE WHEN count(*) > {SKEW_THRESHOLD} THEN {SALT_BUCKETS}
                 ELSE 1 END AS BIGINT) AS salt_buckets
FROM documents
GROUP BY source
"""


def source_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-grouped aggregation END-TO-END through the salting plan
    (extract.salted_host_key): hot sources are split into salt
    sub-keys (deterministic xxhash64(url) % k), a first-stage
    aggregate runs per (source, salt), and a second stage merges the
    sub-aggregates per source.  The final result is salt-INVARIANT,
    so the DuckDB oracle is the plain per-source aggregate — the gate
    verifies the salted two-stage plan loses/duplicates nothing.  At
    cluster scale stage 1 bounds any single task's group size; see
    tools/bench_salting.py for the measured skew win."""
    from docwire_spark.spark.extract import salted_host_key

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    salted = salted_host_key(
        docs, host_col="source", skew_threshold=SKEW_THRESHOLD,
        salt_buckets=SALT_BUCKETS,
    )
    stage1 = salted.groupBy("source", "salted_host").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("chars"),
        F.min("doc_id").alias("min_doc"),
    )
    return stage1.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum("chars").alias("total_chars"),
        F.min("min_doc").alias("min_doc_id"),
    )


SOURCE_SALTED_AGG_SQL = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id
FROM documents
GROUP BY source
"""


def orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice") / 1000.0, 2).alias("revenue_k"),
        )
    )


ORDERS_BY_NATION_SQL = """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice) / 1000.0, 2) AS revenue_k
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

QUERIES = {
    "events_by_type": events_by_type,
    "source_skew_salt": source_skew_salt,
    "source_salted_agg": source_salted_agg,
    "orders_by_nation": orders_by_nation,
    "pricing_summary": pricing_summary,
}

ORACLES = {
    "events_by_type": EVENTS_BY_TYPE_SQL,
    "source_skew_salt": SOURCE_SKEW_SQL,
    "source_salted_agg": SOURCE_SALTED_AGG_SQL,
    "orders_by_nation": ORDERS_BY_NATION_SQL,
    "pricing_summary": PRICING_SUMMARY_SQL,
}
