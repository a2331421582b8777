"""HLL sketch: estimator accuracy vs true cardinality, shard-merge
property (the reason it works distributed), and the map-side partial
aggregation plan shape."""

from pyspark.sql import functions as F

from docwire_spark.ops.hll import (
    N_REGISTERS, hll_estimate, hll_registers,
)

SF = "/root/testdata/sf0.01"


def _regs(df):
    return {r.register: r.max_rho for r in df.collect()}


def test_estimate_within_hll_error_bounds(spark):
    regs = _regs(hll_registers(spark, SF))
    truth = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("text").distinct().count()
    )
    est = hll_estimate(regs)
    # m=256 -> sigma ~ 6.5%; allow 3 sigma
    assert abs(est - truth) / truth < 0.2, (est, truth)


def test_registers_merge_by_max(spark):
    """Sketches over disjoint shards folded register-wise by max must
    equal the whole-corpus sketch — the distributive property that
    makes per-shard/per-day sketches foldable later."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    import docwire_spark.ops.hll as H

    def sketch(df):
        reg, rho = H._register_exprs("text", "DIV")
        return _regs(
            df.selectExpr(
                f"CAST({reg} AS BIGINT) AS register",
                f"CAST({rho} AS BIGINT) AS rho",
            ).groupBy("register").agg(F.max("rho").alias("max_rho"))
        )

    whole = sketch(docs)
    a = sketch(docs.filter("doc_id % 2 = 0"))
    b = sketch(docs.filter("doc_id % 2 = 1"))
    merged = dict(a)
    for k, v in b.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole


def test_partial_aggregation_before_exchange(spark):
    plan = hll_registers(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_max" in plan
    assert plan.index("partial_max") > plan.index("Exchange hashpartitioning")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_register_bounds(spark):
    regs = _regs(hll_registers(spark, SF))
    assert len(regs) <= N_REGISTERS
    assert all(0 <= k < N_REGISTERS for k in regs)
    assert all(1 <= v <= 25 for v in regs.values())
