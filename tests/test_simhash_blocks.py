"""Parameterized simhash pigeonhole decomposition (VERDICT r3 #2):
the production config (64-bit hash, 4 x 16-bit blocks, d <= 3) must
keep exact recall AND shrink per-(block, value) candidate buckets by
~2^11 versus the 60-bit demo config — the difference between linear
and quadratic candidate growth at web scale."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from docwire_spark.ops.dedup import (
    DEMO_BLOCK_WIDTHS,
    DEMO_HAMMING_THRESHOLD,
    PROD_BLOCK_WIDTHS,
    PROD_HAMMING_THRESHOLD,
    _block_exprs,
    simhash_pairs,
    simhash_table,
)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _rand_hashes(n: int, bits: int, seed: int) -> list[int]:
    rng = random.Random(seed)
    return [_signed(rng.getrandbits(bits)) for _ in range(n)]


def _avg_bucket(spark, hashes: list[int], widths) -> float:
    df = spark.createDataFrame(
        [(h,) for h in hashes], "simhash bigint"
    ).distinct()
    blocks_expr, _ = _block_exprs(widths)
    buckets = (
        df.select(F.posexplode(F.expr(blocks_expr)).alias("blk", "val"))
        .groupBy("blk", "val")
        .count()
    )
    row = buckets.agg(F.avg("count").alias("a")).first()
    return float(row["a"])


def test_production_buckets_shrink_by_about_2_to_the_11(spark):
    """Average (block, value) bucket size: demo 5-bit blocks hold
    ~n/32 reps, production 16-bit blocks ~n/65536 — a ~2^11 reduction
    in the per-bucket candidate join size."""
    demo = _avg_bucket(spark, _rand_hashes(20000, 60, seed=7),
                       DEMO_BLOCK_WIDTHS)
    prod = _avg_bucket(spark, _rand_hashes(20000, 64, seed=7),
                       PROD_BLOCK_WIDTHS)
    # demo ~ 20000/32..20000/16 avg over mixed 4/5-bit widths; prod
    # buckets are almost all singletons. Require >= 2^9 to leave slack
    # for collision noise while still proving the decomposition works.
    assert demo / prod >= 2 ** 9, (demo, prod)
    assert prod < 1.5  # 16-bit blocks over 20k rows: ~all singletons


def test_production_config_exact_recall_at_d3(spark):
    """Pigeonhole recall must stay exactly 1.0 under the production
    decomposition: every pair within hamming 3 is found, none beyond."""
    rng = random.Random(13)
    base = [_signed(rng.getrandbits(64)) for _ in range(40)]
    rows = [(i, h) for i, h in enumerate(base)]
    nxt = len(rows)
    # plant near-dups at hamming 1..3 off the first 10 bases
    for k, h in enumerate(base[:10]):
        d = k % 3 + 1
        uh = h & ((1 << 64) - 1)
        for b in rng.sample(range(64), d):
            uh ^= 1 << b
        rows.append((nxt, _signed(uh)))
        nxt += 1
    df = spark.createDataFrame(rows, "doc_id bigint, simhash bigint")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(
            df, widths=PROD_BLOCK_WIDTHS,
            hamming_threshold=PROD_HAMMING_THRESHOLD,
        ).collect()
    }
    # brute-force truth
    want = set()
    for i, hi in rows:
        for j, hj in rows:
            if i < j:
                d = bin((hi ^ hj) & ((1 << 64) - 1)).count("1")
                if d <= PROD_HAMMING_THRESHOLD:
                    want.add((i, j, d))
    assert got == want


def test_pigeonhole_validity_is_enforced(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id bigint, simhash bigint")
    with pytest.raises(ValueError):
        simhash_pairs(df, widths=(16, 16, 16, 16), hamming_threshold=4)


def test_simhash_table_64_bit_spec(spark):
    """The production 64-bit kernel follows the md5 hex spec: bit b of
    a single-token doc's simhash equals bit b of the token's first-16-
    hex-chars value (one token -> vote sign is the bit itself)."""
    import hashlib

    df = spark.createDataFrame(
        [(1, "hello"), (2, "")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash_table(df, 64).collect()}
    want = int(hashlib.md5(b"hello").hexdigest()[:16], 16)
    assert got[1] == _signed(want)
    assert got[2] == 0
