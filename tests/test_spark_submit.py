"""The north-rule launch shape, literally: ``spark-submit
--master local-cluster[2,2,...] --py-files docwire_spark.zip
jobs/extract_job.py``.

local-cluster starts each executor as a REAL separate JVM whose
python workers see only the shipped zip (plus their own spark dirs) —
so this test fails if the package does not actually travel via
--py-files/addPyFile, which single-JVM local[N] can never detect."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not available")


def test_extract_job_via_spark_submit_multi_executor():
    from docwire_spark.spark.session import package_zip

    zip_path = package_zip(
        os.path.join(tempfile.mkdtemp(prefix="pyfiles_"),
                     "docwire_spark.zip")
    )
    out = tempfile.mkdtemp(prefix="submit_out_")
    env = dict(os.environ)
    env["SPARK_EXECUTOR_MEMORY"] = "1g"  # fit the 1536m worker slots
    env["SPARK_DRIVER_MEMORY"] = "2g"
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            _spark_submit(),
            "--master", "local-cluster[2,2,1536]",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "extract_job.py"),
            "--n-docs", "400",
            "--n-shards", "8",
            "--out", os.path.join(out, "res"),
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=tempfile.gettempdir(),  # NOT the repo: no cwd fallback
    )
    assert res.returncode == 0, res.stderr[-4000:]
    summary = None
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"n_docs"' in line:
            summary = json.loads(line)
    assert summary is not None, res.stdout[-2000:]
    assert summary["n_docs"] == 400
    assert summary["n_failed"] == 0
    assert summary["n_metric_partitions"] == 8
    # multi-executor proof: the standalone backend registered both
    # separate-JVM executors (i.e. build_session honored --master and
    # did not silently fall back to single-JVM local[N])
    assert res.stderr.count("Executor added:") >= 2, res.stderr[-3000:]
    shutil.rmtree(out, ignore_errors=True)
