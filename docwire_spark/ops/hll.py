"""HyperLogLog registers — bounded-memory distinct counting.

"How many unique documents are in this 10^12-row corpus?" is the
first question every dedup pass asks, and the exact answer
(``COUNT(DISTINCT fingerprint)``) costs a full shuffle of every
distinct value.  The HLL sketch answers it with a 256-row table: hash
every value, use the low byte as a register index, and keep per
register the maximum number of leading zeros (+1) of the remaining
bits.  ``groupBy(register).max(rho)`` partial-aggregates map-side, so
the only shuffle is 256 rows per partition no matter the corpus size
— and sketches from disjoint corpus shards MERGE by taking the
register-wise max, which is why the estimator works on a cluster at
all (Flajolet et al., "HyperLogLog", AofA 2007).

Spark ships ``approx_count_distinct`` (HLL++) natively — use that in
production.  This explicit-register version exists because (a) the
registers themselves are the mergeable artifact a pipeline stores per
shard/day and folds later, which the opaque aggregate doesn't expose,
and (b) the hash is the same md5-slice fold the Bloom op uses, which
evaluates identically in Spark SQL and DuckDB — so the oracle
replays the exact registers, not an analogue.

All register math is integer-exact (rho via ``length(bin(w))``, no
floating log), so the register table is bit-identical across engines,
partitionings, and row orders.  Only the final cardinality estimate
(``hll_estimate``) uses doubles — it is a driver-side scalar over 256
numbers, tested against the true count, and not part of the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import hash_expr
from .common import load

N_REGISTERS = 256  # 2^8 -> relative error ~1.04/sqrt(256) = 6.5%
_W_BITS = 24  # remaining hash bits scored for leading zeros


def _register_exprs(col: str, div: str) -> tuple[str, str]:
    """(register, rho) SQL for ``col`` — ``div`` is the integer-div
    spelling ('DIV' Spark, '//' DuckDB); everything else is shared."""
    h = hash_expr(col, 0, 2 ** 32)
    w = f"(({h}) {div} {N_REGISTERS})"
    reg = f"(({h}) % {N_REGISTERS})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {_W_BITS + 1}"
        f" ELSE {_W_BITS + 1} - length(bin({w})) END"
    )
    return reg, rho


def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 256-row register table for distinct-text cardinality."""
    reg, rho = _register_exprs("text", "DIV")
    docs = load(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            f"CAST({reg} AS BIGINT) AS register",
            f"CAST({rho} AS BIGINT) AS rho",
        )
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: dict[int, int],
                 m: int = N_REGISTERS) -> float:
    """Flajolet's estimator with the small-range linear-counting
    correction; registers absent from the dict are zero."""
    import math

    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -registers.get(j, 0) for j in range(m))
    e = alpha * m * m / s
    zeros = sum(1 for j in range(m) if registers.get(j, 0) == 0)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


def _duck_sql() -> str:
    reg, rho = _register_exprs("text", "//")
    return f"""
SELECT CAST({reg} AS BIGINT) AS register,
       CAST(max({rho}) AS BIGINT) AS max_rho
FROM documents
GROUP BY 1
"""


HLL_REGISTERS_SQL = _duck_sql()

QUERIES = {"hll_registers": hll_registers}
ORACLES = {"hll_registers": HLL_REGISTERS_SQL}
