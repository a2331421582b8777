"""Count-min sketch: never undercounts, eps*N overcount bound,
shard-mergeability, and the bounded-shuffle plan shape."""

from pyspark.sql import functions as F

from docwire_spark.ops.cms import CMS_D, CMS_W, cms_grid, cms_query

SF = "/root/testdata/sf0.01"


def _grid(df):
    return {(r.row, r.col): r.cnt for r in df.collect()}


def _true_counts(spark):
    from docwire_spark.ops.common import TOKENS_EXPR

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr(f"{TOKENS_EXPR} AS ts")
        .selectExpr(
            "explode(CASE WHEN size(ts) >= 2 THEN"
            " transform(sequence(1, size(ts) - 1),"
            " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
            " ELSE array() END) AS gram"
        )
        .groupBy("gram").count().collect()
    )
    return {r.gram: r["count"] for r in rows}


def test_cms_guarantees(spark):
    grid = _grid(cms_grid(spark, SF))
    truth = _true_counts(spark)
    n_total = sum(truth.values())
    eps_bound = (2.718 / CMS_W) * n_total
    overs = 0
    for gram, true_c in truth.items():
        est = cms_query(grid, gram)
        assert est >= true_c, (gram, est, true_c)  # NEVER undercounts
        if est > true_c:
            overs += 1
        assert est - true_c <= 4 * eps_bound, (gram, est, true_c)
    # the corpus vocabulary >> w, so collisions (overcounts) must
    # actually occur or the bound assertions are vacuous
    assert overs > 0
    # grid row sums each equal N (every gram increments every row)
    for j in range(CMS_D):
        assert sum(c for (r, _), c in grid.items() if r == j) == n_total


def test_cms_merges_by_cell_addition(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    import docwire_spark.ops.cms as C
    from docwire_spark.ops.common import load

    whole = _grid(cms_grid(spark, SF))

    def half(pred):
        import unittest.mock as mock

        with mock.patch.object(
            C, "load",
            lambda sp, sf, name, **kw: docs.filter(pred),
        ):
            return _grid(C.cms_grid(spark, SF))

    a = half("doc_id % 2 = 0")
    b = half("doc_id % 2 = 1")
    merged = dict(a)
    for k, v in b.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_cms_partial_aggregation_and_size(spark):
    df = cms_grid(spark, SF)
    assert df.count() <= CMS_D * CMS_W
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert plan.index("partial_count") > plan.index(
        "Exchange hashpartitioning"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
