"""Hashed-linear classifier inference and deterministic training
shuffle: exactness, determinism across partitionings, and the plan
shapes that make them scan-speed at corpus scale."""

from pyspark.sql import functions as F

from docwire_spark.ops.classify import N_BUCKETS, ml_quality_score
from docwire_spark.ops.packing import SHARD_SIZE, train_shuffle_export

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_classifier_matches_python_replay(spark):
    """Bit-exact forward pass: replay the hash + Knuth-mix weights in
    plain Python over the same tokenization."""
    import hashlib
    import re

    rows = ml_quality_score(spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in rows[:50]:
        toks = re.findall(r"[a-z0-9]+", docs[r.doc_id].lower())
        score = 0
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % N_BUCKETS
            score += (b * 2654435761) % 1001 - 500
        assert (r.n_tok, r.score_int, r.label) == (
            len(toks), score, int(score > 0)
        ), r.doc_id
    # both labels must actually occur, or the threshold test is vacuous
    labels = {r.label for r in rows}
    assert labels == {0, 1}


def test_classifier_is_map_only_jvm_side(spark):
    """Model inference must pipeline into the scan: no Python eval
    node, no shuffle, no join — one codegen map stage."""
    plan = _plan(ml_quality_score(spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_shuffle_export_is_a_permutation(spark):
    out = train_shuffle_export(spark, SF).collect()
    slots = {(r.shard, r.pos_in_shard) for r in out}
    assert len(slots) == len(out)  # bijective: every doc a unique slot
    assert all(0 <= r.pos_in_shard < SHARD_SIZE for r in out)
    n_docs = len(out)
    full_shards = n_docs // SHARD_SIZE
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, 0)
        by_shard[r.shard] += 1
    for s in range(full_shards):
        assert by_shard[s] == SHARD_SIZE  # dense packing, no gaps


def test_shuffle_export_stable_across_partitionings(spark):
    a = {(r.doc_id, r.shard, r.pos_in_shard)
         for r in train_shuffle_export(spark, SF).repartition(3).collect()}
    b = {(r.doc_id, r.shard, r.pos_in_shard)
         for r in train_shuffle_export(spark, SF).repartition(17).collect()}
    assert a == b


def test_shuffle_export_global_window_is_bucket_sized(spark):
    """The only unpartitioned window must run over per-bucket totals
    (<=65536 rows from the two-byte hash-prefix bucketing), never
    over the docs themselves — the accidental-serialization trap."""
    plan = _plan(train_shuffle_export(spark, SF))
    assert "SinglePartition" in plan  # the bucket-totals phase exists...
    import re

    # ...and every window over docs is partitioned by bucket
    for m in re.finditer(r"Window \[[^\]]*row_number[^\]]*\]", plan):
        assert "bkt" in m.group(0)


def test_train_beats_majority_and_is_deterministic(spark):
    """The centroid fit must be a real classifier: clearly better than
    the majority vote on the balanced teacher labels, and bit-stable
    across runs (exact integer arithmetic end to end)."""
    from docwire_spark.ops.classify import ml_quality_train

    rows = {r.doc_id: (r.y, r.pred)
            for r in ml_quality_train(spark, SF).collect()}
    n = len(rows)
    assert n == 500
    acc = sum(1 for y, p in rows.values() if y == p) / n
    pos_rate = sum(y for y, _ in rows.values()) / n
    majority = max(pos_rate, 1 - pos_rate)
    assert 0.35 < pos_rate < 0.65, "teacher labels should be balanced"
    assert acc > majority + 0.1, (acc, majority)
    rows2 = {r.doc_id: (r.y, r.pred)
             for r in ml_quality_train(spark, SF).collect()}
    assert rows == rows2


def test_train_inference_pass_is_map_side(spark):
    """The returned eval plan must score with inlined literal weights
    over the cached base — no join, at most the cache-fill Exchange."""
    from docwire_spark.ops.classify import ml_quality_train

    plan = _plan(ml_quality_train(spark, SF))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
