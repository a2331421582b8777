"""SemDeDup (cluster-then-prune semantic dedup): keep/drop semantics
against a python replay, in-cluster-only pruning, and the bounded
join shape."""

import pytest
from pyspark.sql import functions as F

from docwire_spark.ops.cluster import SEMDEDUP_TAU, semdedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    rows = semdedup(spark, SF).collect()
    return {r.vec_id: r for r in rows}


def test_covers_every_vector_exactly_once(spark, result):
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(result) == n


def test_drop_iff_smaller_id_neighbor_in_same_cluster(spark, result):
    """Python replay of the keep rule over the op's own clustering:
    a vector is dropped iff some lower-id vector in its cluster has
    cosine >= tau (rounded to 6, as the op computes it)."""
    import math

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    by_cluster = {}
    for vid, r in result.items():
        by_cluster.setdefault(r.cluster_id, []).append(vid)

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(dot / (na * nb), 6)

    n_dropped = 0
    for cid, members in by_cluster.items():
        members.sort()
        for i, vb in enumerate(members):
            has_close_smaller = any(
                cos(vecs[va], vecs[vb]) >= SEMDEDUP_TAU
                for va in members[:i]
            )
            assert result[vb].keep_flag == int(not has_close_smaller), (
                cid, vb,
            )
            n_dropped += int(has_close_smaller)
    assert n_dropped > 0, "corpus must contain semantic dups at tau"


def test_zero_norm_vector_never_forces_drops(spark, tmp_path):
    """An all-zero embedding (failed-encode row) must be inert: 0/0
    cosine evaluates to NULL (not NaN) in both engines, so it neither
    drops others nor is dropped by similarity.  Regression test for
    the NaN >= tau Spark semantics."""
    import math

    rows = [(0, [0.0] * 64, 0)]  # zero vector, lowest id in cluster
    for i in range(1, 12):
        # unit-ish vectors along distinct axes: pairwise cos ~ 0
        v = [0.0] * 64
        v[i] = 1.0
        rows.append((i, v, 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.vec_id: r for r in semdedup(spark, str(tmp_path)).collect()}
    assert len(out) == 12
    # the zero vector pairs with everything at cos NULL -> everyone
    # keeps (axis vectors are mutually orthogonal, cos 0 < tau)
    assert all(r.keep_flag == 1 for r in out.values()), out


def test_plan_bounded_join_shape(spark):
    plan = (
        semdedup(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    # the pairwise stage must be an equi-join on the cluster key
    # (fan-out bounded by cluster size), never a cartesian product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
