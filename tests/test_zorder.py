"""Z-order clustering: Morton-code exactness, and the point of the
whole exercise — per-file min/max stats get tight enough to prune."""

from pyspark.sql import functions as F

from docwire_spark.ops.zorder import zorder_layout, zorder_rewrite

SF = "/root/testdata/sf0.01"


def test_morton_interleave_matches_python(spark):
    rows = zorder_layout(spark, SF).collect()
    assert rows

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r.zval == morton(r.lang_rank, r.len_rank), r


def test_zorder_layout_tightens_file_stats(spark):
    """min/max spans per output partition (= per file) must shrink
    versus the ingest-ordered layout on BOTH dimensions' product —
    the measurable proxy for stats pruning working."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    n_files = 8

    def avg_span_product(df):
        spans = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("lang_rank") - F.min("lang_rank") + 1).alias("ls"),
                (F.max("len_rank") - F.min("len_rank") + 1).alias("ns"),
            )
            .selectExpr("avg(ls * ns) AS sp")
            .first()
        )
        return spans.sp

    from docwire_spark.ops.zorder import zorder_stamp

    z = avg_span_product(
        zorder_stamp(docs)
        .repartitionByRange(n_files, "zval", "doc_id")
        .sortWithinPartitions("zval", "doc_id")
    )
    ingest = avg_span_product(
        zorder_stamp(docs).repartitionByRange(n_files, "doc_id")
    )
    # z-ordered files cover a fraction of the key-space rectangle
    assert z < ingest * 0.5, (z, ingest)


def test_zorder_rewrite_has_no_global_window(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    plan = zorder_rewrite(docs, 8)._jdf.queryExecution() \
        .executedPlan().toString()
    # every window must rank a DICTIONARY (ordered by lang or
    # n_chars) — a window mentioning zval would be a global rank over
    # the docs themselves, the accidental-serialization trap
    import re

    wins = re.findall(r"Window \[[^\n]*", plan)
    assert wins  # the two dictionary ranks exist
    for w in wins:
        assert "zval" not in w, w
        assert "_zlang" in w or "_zlen" in w, w
    assert "rangepartitioning" in plan.lower()
    assert "CartesianProduct" not in plan


def test_zorder_rewrite_preserves_all_input_columns(spark):
    """The rewrite is a physical OPTIMIZE: its output must be a
    drop-in replacement for the input table — same columns (text and
    all), clustered, no helper columns left behind (ADVICE r3)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = zorder_rewrite(docs, 4)
    assert set(out.columns) == set(docs.columns)
    assert out.count() == docs.count()


def test_zorder_rewrite_keeps_null_key_rows(spark):
    """A physical rewrite must never drop rows: NULL lang/n_chars
    (undetected language, missing length) normalize to sentinels
    instead of vanishing through the inner dictionary joins."""
    rows = [(1, "en", 100), (2, None, 50), (3, "de", None),
            (4, None, None)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, n_chars bigint"
    )
    out = zorder_rewrite(df, 2).select("doc_id").collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 3, 4]
