"""LM-based curation ops: CCNet-style bigram perplexity bucketing and
DSIR importance selection — semantic sanity on synthetic corpora, the
bounded-model invariant, and the plan shapes that make them scale."""

import pytest
from pyspark.sql import functions as F

from docwire_spark.ops.lm_filter import (
    DSIR_BUCKETS, DSIR_K, dsir_select, lm_perplexity,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scratch_docs(spark, tmp_path_factory):
    """Synthetic corpus with a controlled quality gradient: fluent
    docs repeat a small phrase set (high bigram probability under the
    self-trained LM), junk docs are unique token soup (every bigram
    near-singleton)."""
    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = []
    for i in range(60):
        rows.append((i, "en", (fluent + " ") * 3 + f"tail{i}"))
    for i in range(60, 90):
        junk = " ".join(f"zq{i}x{j}" for j in range(40))
        rows.append((i, "en", junk))
    for i in range(90, 95):
        rows.append((i, "en", "solo"))  # <2 tokens -> no bigrams
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    d = tmp_path_factory.mktemp("lmcorpus")
    df.withColumn("source", F.lit("src0")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_perplexity_orders_fluent_below_junk(spark, scratch_docs):
    out = {r.doc_id: r for r in lm_perplexity(spark, scratch_docs).collect()}
    assert len(out) == 95
    fluent_ppl = [out[i].ppl for i in range(60)]
    junk_ppl = [out[i].ppl for i in range(60, 90)]
    assert max(fluent_ppl) < min(junk_ppl)
    for i in range(90, 95):
        assert out[i].n_bigrams == 0
        assert out[i].ppl is None
        assert out[i].bucket == "none"


def test_perplexity_buckets_follow_cutoffs(spark, scratch_docs):
    rows = lm_perplexity(spark, scratch_docs).collect()
    by_bucket = {}
    for r in rows:
        if r.n_bigrams > 0:
            by_bucket.setdefault(r.bucket, []).append(r)
    # head must exist and be all-fluent; junk must never reach head
    assert by_bucket.get("head") and all(
        r.doc_id < 60 for r in by_bucket["head"]
    )
    # bucket boundaries are monotone in lp_sum: head >= middle >= tail
    # (ties at a cutoff legitimately collapse a bucket — all junk docs
    # here share one exact lp_sum, so only the ordering is asserted)
    order = [b for b in ("head", "middle", "tail") if b in by_bucket]
    for hi, lo in zip(order, order[1:]):
        assert min(r.lp_sum for r in by_bucket[hi]) >= max(
            r.lp_sum for r in by_bucket[lo]
        )


def test_perplexity_single_sample_window(spark):
    """The only Window (and its Sort) runs over the md5 SAMPLE for
    cutoffs — full-corpus bucketing must stay map-side against the
    broadcast threshold table."""
    plan = lm_perplexity(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_dsir_topk_prefers_target_like_docs(spark, scratch_docs):
    """Docs sharing the target slice's feature distribution must
    outrank docs whose features are ABSENT from the target: fluent
    docs (whose bigrams saturate the target slice) must all score
    above every non-target junk doc, whose hapax features carry a
    strong negative log-ratio.  (Junk docs INSIDE the md5 target
    slice legitimately score high — their singleton features are
    target-exclusive; that is DSIR behaving as specified.)"""
    import hashlib

    out = dsir_select(spark, scratch_docs).collect()
    assert 0 < len(out) <= DSIR_K
    # descending by exact integer weight, doc_id tiebreak
    keys = [(-r.lw_sum, r.doc_id) for r in out]
    assert keys == sorted(keys)
    in_target = {
        i: hashlib.md5(f"t:{i}".encode()).hexdigest()[:8] < "40000000"
        for i in range(95)
    }
    score = {r.doc_id: r.lw_sum for r in out}
    fluent = [score[i] for i in range(60)]
    junk_out = [
        score[i] for i in range(60, 90) if not in_target[i] and i in score
    ]
    assert junk_out, "corpus must contain non-target junk docs"
    assert min(fluent) > max(junk_out)


def test_dsir_model_bounded_and_broadcast(spark):
    """The weight table can never exceed DSIR_BUCKETS rows — the
    property that makes its broadcast legal at ANY corpus size — and
    the scoring join must actually broadcast it."""
    assert DSIR_BUCKETS == 4096
    plan = dsir_select(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_dsir_weights_exact_integers(spark, scratch_docs):
    """lw_sum is an exact scaled-BIGINT sum: recomputing logweight
    from it must reproduce the column bit-for-bit (no float
    accumulation anywhere)."""
    for r in dsir_select(spark, scratch_docs).collect():
        assert r.logweight == round(r.lw_sum / 1e9, 6)
