"""Z-order (Morton) clustering — the data-layout side of scan
pruning at lake scale.

Parquet/Iceberg skip files by min/max column stats, but stats only
prune what the LAYOUT co-locates: a corpus sorted by ingest time
scatters every language across every file, so ``WHERE lang = 'de'
AND n_chars > 10000`` reads everything.  Iceberg's and Delta's
``OPTIMIZE ... ZORDER BY`` rewrite interleaves the bits of several
sort keys into one Morton value and sorts by it, so files become
hyper-rectangles in key space and min/max stats prune on EVERY
z-ordered column at once.

The z-value computation is pure integer Catalyst: each key is first
normalized to a 16-bit rank (language by dictionary rank, length by
its position in the corpus-wide distinct order — both bounded
aggregations joined back by broadcast, not driver lookups), then the
two ranks interleave into a 32-bit Morton code via shift/mask
arithmetic.  BIGINT-exact throughout, so DuckDB replays the
interleave as the oracle.

The physical rewrite (``zorder_rewrite``) is
``repartitionByRange(n, zval).sortWithinPartitions(zval)`` — range
sampling over ONE long is exactly how Iceberg's rewrite action
spreads the curve, and it replaces the global-window rank that would
serialize the corpus onto one task.  tests/test_zorder.py measures
the actual benefit: per-file min/max spans shrink vs an
ingest-ordered layout, i.e. stats pruning starts working.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import load


def _interleave16(a: str, b: str, shl: str) -> str:
    """Morton-interleave two 16-bit ints: bit i of ``a`` lands at
    2i, bit i of ``b`` at 2i+1.  ``shl`` spells the engine's left
    shift (Spark ``shiftleft(x, n)``, DuckDB ``x << n``)."""
    terms = []
    for i in range(16):
        terms.append(shl.format(x=f"(({a}) & {1 << i})", n=i))
        terms.append(shl.format(x=f"(({b}) & {1 << i})", n=i + 1))
    return "(" + " + ".join(terms) + ")"


_SHL_SPARK = "shiftleft({x}, {n})"
_SHL_DUCK = "({x} << {n})"


def zorder_stamp(docs: DataFrame) -> DataFrame:
    """Stamp (lang_rank, len_rank, zval) onto a documents frame —
    two bounded dictionary builds + broadcast joins + one map-side
    interleave expression.

    ALL input columns are preserved (the stamp only appends): the
    physical rewrite below must emit the full table, clustered, with
    the original lang/n_chars values intact so the rewritten files
    carry the tight min/max stats the layout exists for.

    NULL keys (undetected lang, missing length) are normalized to
    sentinel values in separate join-key columns — the dictionary
    joins are inner equi-joins and NULL never equi-matches, so
    without this a physical rewrite would silently drop those rows.
    The sentinels never leak into the output columns."""
    from pyspark.sql import Window

    in_cols = docs.columns
    docs = docs.withColumn("_zlang", F.coalesce(F.col("lang"), F.lit(""))) \
               .withColumn("_zlen",
                           F.coalesce(F.col("n_chars"), F.lit(-1)))
    langs = (
        docs.select("_zlang").distinct()
        .withColumn(
            "lang_rank",
            (F.row_number().over(Window.orderBy("_zlang")) - 1)
            .cast("bigint"),
        )
    )
    lens = (
        docs.select("_zlen").distinct()
        .withColumn(
            "len_rank",
            (F.row_number().over(Window.orderBy("_zlen")) - 1)
            .cast("bigint"),
        )
        # clamp into 16 bits; production rewrites quantile-bucket
        .withColumn("len_rank", F.expr("len_rank % 65536"))
    )
    z = _interleave16("lang_rank", "len_rank", _SHL_SPARK)
    return (
        docs.join(F.broadcast(langs), "_zlang")
        .join(F.broadcast(lens), "_zlen")
        .selectExpr(
            *in_cols, "lang_rank", "len_rank",
            f"CAST({z} AS BIGINT) AS zval",
        )
    )


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    return zorder_stamp(docs).select(
        "doc_id", "lang_rank", "len_rank", "zval"
    )


def zorder_rewrite(docs: DataFrame, n_files: int) -> DataFrame:
    """The physical OPTIMIZE: range-partition along the z-curve and
    sort within partitions; each output partition becomes one file
    carrying ALL original columns with tight (lang, n_chars) min/max
    stats.  The rank/zval helper columns are dropped after the sort
    (a narrow projection — partition order is preserved), so the
    rewrite is a drop-in replacement for the input table."""
    return (
        zorder_stamp(docs)
        .repartitionByRange(n_files, "zval", "doc_id")
        .sortWithinPartitions("zval", "doc_id")
        .drop("lang_rank", "len_rank", "zval")
    )


_ZD = _interleave16("lang_rank", "len_rank", _SHL_DUCK)
# the oracle mirrors zorder_stamp's NULL normalization (lang -> '',
# n_chars -> -1) so NULL-key rows survive the inner joins and rank
# identically in both engines ('' sorts first; NULL would sort last
# in DuckDB and drop via USING joins)
ZORDER_LAYOUT_SQL = f"""
WITH langs AS (
  SELECT lang,
         CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT)
           AS lang_rank
  FROM (SELECT DISTINCT coalesce(lang, '') AS lang FROM documents)
),
lens AS (
  SELECT n_chars,
         CAST((row_number() OVER (ORDER BY n_chars) - 1) % 65536
              AS BIGINT) AS len_rank
  FROM (SELECT DISTINCT coalesce(n_chars, -1) AS n_chars FROM documents)
)
SELECT d.doc_id, l.lang_rank, n.len_rank,
       CAST({_ZD} AS BIGINT) AS zval
FROM documents d
JOIN langs l ON coalesce(d.lang, '') = l.lang
JOIN lens n ON coalesce(d.n_chars, -1) = n.n_chars
"""


QUERIES = {"zorder_layout": zorder_layout}
ORACLES = {"zorder_layout": ZORDER_LAYOUT_SQL}
