"""The spark-submit extraction job (north-rule shape).

    spark-submit --master local[8] --py-files dist/docwire_spark.zip \
        jobs/extract_job.py --n-docs 20000 --out /tmp/out

Reads/creates the Common-Crawl-style pages table, runs the sharded
mapInPandas extraction, writes results + per-partition metrics through
the checkpointed writer, and prints a JSON summary line (wall time,
docs/sec, failures).

On a real cluster the input is an Iceberg table and the writer is an
Iceberg MERGE; here the corpus is the deterministic synthetic
generator and the writer is the atomic-staging emulation with the same
resume contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument("--n-docs", type=int, default=20_000)
    ap.add_argument("--n-hosts", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--out", default=None)
    ap.add_argument("--corpus-cache", default=None,
                    help="parquet path for the generated corpus; generated "
                    "once, then read back so extraction timing excludes "
                    "generation")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from docwire_spark.spark.extract import extract_pages, metrics_by_partition
    from docwire_spark.spark.lineage import CheckpointedWriter
    from docwire_spark.spark.session import build_session

    # 32 MB scan splits: enough tasks per core for wave smoothing on
    # this corpus; 4096-row Arrow batches amortize the JVM<->python
    # round-trip (measured 46.1s -> 41.3s at 16 cores, 600k docs) —
    # safe here because corpus rows are ~3 KB (12 MB/batch); keep the
    # session default (512) for unknown row-size corpora
    spark = build_session(
        master=args.master,
        app_name="docwire-extract",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "33554432",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
        },
    )
    # AQE only inserts materialization barriers here — the extraction
    # pipeline is scan -> repartition -> mapInPandas -> agg with no
    # joins or skewed aggregations to re-plan (measured: 69s -> 42s on
    # a 600k-doc run at local[16] with it off)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    if args.corpus_cache:
        if not os.path.exists(os.path.join(args.corpus_cache, "_SUCCESS")):
            from docwire_spark.spark.corpus import build_pages_df

            build_pages_df(
                spark, args.n_docs, n_hosts=args.n_hosts, seed=args.seed
            ).write.mode("overwrite").parquet(args.corpus_cache)
        pages = spark.read.parquet(args.corpus_cache)
    else:
        from docwire_spark.spark.corpus import build_pages_df

        pages = build_pages_df(
            spark, args.n_docs, n_hosts=args.n_hosts, seed=args.seed
        )

    # warm python workers AND executor JVMs (worker fork + pandas
    # imports, parquet/Arrow JIT compilation — per-executor costs that
    # amortize over a long job but dominate a short timed window).
    # sample() keeps the warmup parallel across every scan split so
    # ALL workers fork and EVERY executor JVM compiles the hot path
    # (limit() would collapse to one partition and warm one worker).
    extract_pages(
        pages.select("url", "html").sample(0.05, seed=1),
        n_shards=args.n_shards,
    ).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    # stats via accumulators updated inside the batch fn: a JVM-side
    # agg over the WIDE python output forces a full row conversion of
    # every result column, which is memory-bandwidth-bound and
    # contends hard at high core counts (measured +16s at 16 cores on
    # 600k docs vs the columnar noop sink).  Accumulators are exact
    # when no task retries occur (verified n_failed==0 runs).
    counters = {
        "docs": sc.accumulator(0),
        "failed": sc.accumulator(0),
        "bytes": sc.accumulator(0),
    }

    t0 = time.time()
    extracted = extract_pages(
        pages.select("url", "html"), n_shards=args.n_shards, counters=counters
    )
    if args.out:
        writer = CheckpointedWriter(args.out, n_shards=args.n_shards, groups=8)
        writer.run(extracted)
        back = writer.read(spark)
        n_parts = back.select("partition_id").distinct().count()
    else:
        # ONE action, columnar sink: every row is extracted and crosses
        # the Arrow boundary; nothing is re-run for stats
        extracted.write.format("noop").mode("overwrite").save()
        n_parts = None
    wall = time.time() - t0
    n_rows = counters["docs"].value
    n_failed = counters["failed"].value
    bytes_in = counters["bytes"].value
    _ = metrics_by_partition, F  # exported paths exercised in tests

    print(
        json.dumps(
            {
                "n_docs": n_rows,
                "n_failed": n_failed,
                "bytes_in": int(bytes_in or 0),
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_rows / wall, 1),
                "mb_per_sec": round((bytes_in or 0) / wall / 1e6, 1),
                "n_metric_partitions": n_parts,
                "master": args.master or "default",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
