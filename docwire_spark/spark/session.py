"""SparkSession construction with the engine's standard tuning.

Scale posture (for a multi-executor cluster; local[N] here is a
single-JVM proxy):
- AQE on (runtime re-plan + skew-join splitting)
- Arrow batches bounded so one batch of large HTML rows stays inside
  executor memory (oversized rows additionally get their own branch,
  see extract.py)
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

ARROW_MAX_RECORDS = 512  # HTML rows are fat; bound the Arrow batch row count


def package_zip(path: str | None = None) -> str:
    """Zip the docwire_spark package for --py-files / addPyFile."""
    import docwire_spark

    pkg_dir = os.path.dirname(os.path.abspath(docwire_spark.__file__))
    if path is None:
        path = os.path.join(tempfile.gettempdir(), "docwire_spark_pyfiles.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "docwire_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return path


def ship_package(spark: SparkSession) -> None:
    """Make docwire_spark importable on executors regardless of the
    driver's cwd (equivalent of spark-submit --py-files)."""
    spark.sparkContext.addPyFile(package_zip())


def build_session(
    master: str | None = None,
    app_name: str = "docwire_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None and "PYSPARK_GATEWAY_PORT" not in os.environ:
        # PYSPARK_GATEWAY_PORT is set only when spark-submit's
        # PythonRunner launched this process — there, --master arrived
        # with the JVM and must not be overridden; plain `python
        # job.py` still defaults to local[N]
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # WARC-Date serialization and the DuckDB oracles assume UTC
        # wall times end-to-end; pin it so a host with a local zone
        # can't shift timestamp roundtrips
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEMORY", "6g"))
        # G1's humongous-object path collapses under the steady stream
        # of row/Arrow byte[] allocations this workload produces
        # (measured on a 600k-doc extraction: 131s G1 vs 58s Parallel
        # at local[16]); throughput GC fits a batch engine
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GC_OPTS", "-XX:+UseParallelGC"),
        )
        .config(
            "spark.executor.extraJavaOptions",
            os.environ.get("SPARK_GC_OPTS", "-XX:+UseParallelGC"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ship_package(spark)
    return spark
