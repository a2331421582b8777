"""End-to-end Spark extraction tests: synthetic corpus -> mapInPandas
extraction -> byte-identity vs the analytically-generated expected
text; plus lineage/resume and skew-salting behavior."""

import os

import pytest
from pyspark.sql import functions as F

from docwire_spark.spark.corpus import build_pages_df
from docwire_spark.spark.extract import (
    extract_pages, metrics_by_partition, salted_host_key, with_host,
)
from docwire_spark.spark.lineage import CheckpointedWriter

N_DOCS = 200


@pytest.fixture(scope="module")
def pages(spark):
    df = build_pages_df(spark, N_DOCS, n_hosts=12, seed=42, oversize_rate=0.02)
    df.cache()
    df.count()
    return df


def test_corpus_deterministic(spark):
    a = build_pages_df(spark, 50, seed=7, n_slices=2).orderBy("url").collect()
    b = build_pages_df(spark, 50, seed=7, n_slices=5).orderBy("url").collect()
    assert [r.url for r in a] == [r.url for r in b]
    assert [bytes(r.html) for r in a] == [bytes(r.html) for r in b]


def test_extract_byte_identity(spark, pages):
    extracted = extract_pages(pages, n_shards=8, with_binary=True)
    joined = (
        extracted.join(pages.select("url", "expected_text"), "url")
        .select("url", "error", "extracted_bytes", "expected_text", "mime")
        .collect()
    )
    assert len(joined) == N_DOCS
    bad = [r for r in joined if r.error is not None]
    assert not bad, bad[:3]
    mismatches = [
        (r.url, bytes(r.extracted_bytes), bytes(r.expected_text))
        for r in joined
        if bytes(r.extracted_bytes) != bytes(r.expected_text)
    ]
    assert not mismatches, mismatches[:2]
    assert all(r.mime == "text/html" for r in joined)


def test_metrics(spark, pages):
    extracted = extract_pages(pages, n_shards=8)
    m = metrics_by_partition(extracted).collect()
    assert sum(r.n_docs for r in m) == N_DOCS
    assert sum(r.n_failed for r in m) == 0
    assert all(r.bytes_in > 0 for r in m)


@pytest.mark.parametrize("mode", ["single_pass", "per_group"])
def test_checkpointed_writer_resume(spark, pages, tmp_path, mode):
    out = str(tmp_path / f"out_{mode}")
    extracted = extract_pages(pages, n_shards=8)
    w = CheckpointedWriter(out, n_shards=8, groups=4)
    stats = w.run(extracted, batch_id="batch1", mode=mode)
    assert stats["groups_written"] == 4

    # simulate a killed job: drop one committed group from the log
    lines = open(w.log_path).read().strip().splitlines()
    with open(w.log_path, "w") as f:
        f.write("\n".join(lines[:-1]) + "\n")
    stats2 = w.run(extracted, batch_id="batch2", mode=mode)
    assert stats2["groups_skipped"] == 3
    assert stats2["groups_written"] == 1

    total = w.read(spark).count()
    assert total == N_DOCS
    # row counts in the commit log match what was written
    logged = sum(
        __import__("json").loads(ln)["n_rows"]
        for ln in open(w.log_path).read().strip().splitlines()
    )
    assert logged == N_DOCS
    # idempotent: nothing left to write
    stats3 = w.run(extracted, batch_id="batch3", mode=mode)
    assert stats3["groups_written"] == 0

    # resume filter drops all committed input rows
    remaining = w.filter_uncommitted(pages).count()
    assert remaining == 0


def test_salted_host_key(spark, pages):
    df = with_host(pages)
    salted = salted_host_key(df, skew_threshold=20, salt_buckets=4)
    rows = salted.groupBy("host", "salted_host").count().collect()
    per_host = {}
    for r in rows:
        per_host.setdefault(r.host, set()).add(r.salted_host)
    host_counts = {r.host: r["count"] for r in df.groupBy("host").count().collect()}
    for host, keys in per_host.items():
        if host_counts[host] > 20:
            assert len(keys) > 1, (host, keys)
        else:
            assert len(keys) == 1


def test_oversize_branch(spark, pages):
    big = pages.filter(F.length("html") > 262_144).count()
    assert big > 0, "corpus should contain oversized rows"
    extracted = extract_pages(
        pages, n_shards=8, with_binary=True, oversize_bytes=262_144
    )
    joined = extracted.join(pages.select("url", "expected_text"), "url")
    bad = joined.filter(
        F.col("extracted_bytes") != F.col("expected_text")
    ).count()
    assert bad == 0
