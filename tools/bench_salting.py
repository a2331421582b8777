"""Measured evidence that ``salted_host_key`` beats the unsalted plan
on a skewed corpus (VERDICT round-1 item 9).

The skew-bound pattern is a host-grouped ``applyInPandas``: grouping
puts the hot host's ENTIRE row set into one task / one Python worker,
so the job's wall time is the hot group's processing time no matter
how many cores exist.  Algebraic aggregates (count/sum) do NOT show
this — Spark's map-side partial aggregation absorbs the skew before
the shuffle — which is why the demonstration op is a per-host pandas
kernel (per-host near-dup scan, quantiles, sessionization are the
real-world equivalents).

Corpus: deterministic zipf-ish skew — the hot host owns 80% of rows,
the tail is uniform over 63 hosts.  The salted plan splits the hot
host into ``salt_buckets`` sub-groups (deterministic
``xxhash64(url) % k``), runs the same pandas kernel per sub-group,
and merges sub-results with a second-stage algebraic aggregate
(salt-invariant output, verified equal to the unsalted result).

Usage: python tools/bench_salting.py [--rows 400000] [--cpus 8]
Prints one JSON line: {"unsalted_sec": .., "salted_sec": .., ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_SHARE = 0.8
N_TAIL_HOSTS = 63
SALT_BUCKETS = 16


def _corpus(spark, n_rows: int):
    from pyspark.sql import functions as F

    df = spark.range(n_rows).select(
        F.col("id"),
        F.when(
            F.col("id") % 10 < 8, F.lit("hot.example")
        ).otherwise(
            F.concat(F.lit("t"), (F.col("id") % N_TAIL_HOSTS).cast("string"),
                     F.lit(".example"))
        ).alias("host"),
        (F.col("id") * 2654435761 % 1000003).cast("double").alias("value"),
    )
    return df.withColumn(
        "url",
        F.concat(F.lit("https://"), F.col("host"), F.lit("/p/"),
                 F.col("id").cast("string")),
    )


def _kernel_schema():
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    return StructType([
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("checksum", DoubleType()),
    ])


def _make_kernel(key_col: str):
    def stats(pdf):
        import hashlib

        import numpy as np
        import pandas as pd

        v = np.sort(pdf["value"].to_numpy()).astype(np.int64)
        # per-host work that cannot be expressed as an algebraic
        # aggregate: a fingerprint scan over the group's rows (the
        # shape of per-host near-dup detection) — ~1us/row, so the
        # hot group dominates the unsalted job's wall time
        acc = 0
        for k in range(0, len(v)):
            acc ^= int.from_bytes(
                hashlib.md5(v[k].tobytes()).digest()[:8], "big"
            )
        return pd.DataFrame(
            {"key": [pdf[key_col].iloc[0]], "n": [len(pdf)],
             "checksum": [float(acc % 1000003)]}
        )

    return stats


def run(spark, n_rows: int):
    from pyspark.sql import functions as F

    from docwire_spark.spark.extract import salted_host_key

    df = _corpus(spark, n_rows).persist()
    df.count()
    schema = _kernel_schema()

    t0 = time.time()
    unsalted = (
        df.groupBy("host").applyInPandas(_make_kernel("host"), schema)
        .select(F.col("key").alias("host"), "n")
        .groupBy("host").agg(F.sum("n").alias("n_rows"))
    )
    rows_u = {r["host"]: r["n_rows"] for r in unsalted.collect()}
    t_unsalted = time.time() - t0

    t0 = time.time()
    salted_df = salted_host_key(
        df, host_col="host", skew_threshold=n_rows // 20,
        salt_buckets=SALT_BUCKETS,
    )
    salted = (
        salted_df.groupBy("salted_host")
        .applyInPandas(_make_kernel("salted_host"), schema)
        .select(
            F.split(F.col("key"), "#").getItem(0).alias("host"), "n"
        )
        .groupBy("host").agg(F.sum("n").alias("n_rows"))
    )
    rows_s = {r["host"]: r["n_rows"] for r in salted.collect()}
    t_salted = time.time() - t0

    assert rows_u == rows_s, "salted plan changed the result"
    df.unpersist()
    return t_unsalted, t_salted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from docwire_spark.spark.session import build_session

    spark = build_session(
        master=f"local[{args.cpus}]", app_name="bench-salting",
        shuffle_partitions=args.cpus * 4,
    )
    run(spark, 20_000)  # warmup: JVM + python worker pool
    t_unsalted, t_salted = run(spark, args.rows)
    print(json.dumps({
        "rows": args.rows,
        "cpus": args.cpus,
        "hot_share": HOT_SHARE,
        "salt_buckets": SALT_BUCKETS,
        "unsalted_sec": round(t_unsalted, 2),
        "salted_sec": round(t_salted, 2),
        "speedup": round(t_unsalted / t_salted, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
