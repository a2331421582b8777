"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) — learn the first ``BPE_MERGES`` merge rules from the corpus.

Reference parity: the reference engine has no tokenizer-training
operator — training-data-pipeline extension per the build brief (its
token counting is the consumer of the artifact this op produces).

Scale design (the part that matters at 10^12 documents): BPE trains
on the WORD-FREQUENCY table, not the corpus.  Phase 1 is the only
corpus-scale stage — one explode + hash-agg into ``(token, count)``,
capped to the ``BPE_VOCAB_CAP`` most frequent words (TakeOrdered, no
global sort).  Every merge iteration then runs on that bounded table:
pair counting is an in-row transform + one tiny aggregate (keys
bounded by vocab x max word length), and the winning pair — two
strings — is collected to the driver and inlined as literals into the
next iteration's merge expression.  This is the kmeans
tiny-model/huge-data topology (ops/cluster.py): the MODEL crosses the
driver boundary, the data never does.

Engine parity: the left-to-right non-overlapping merge is a string
fold — ``aggregate`` in Spark, ``list_reduce`` over a ''-prepended
list in DuckDB — whose accumulator is the merged word with symbols
joined by unit separator (0x1f).  A merge fires only when the
accumulator's LAST SYMBOL is exactly ``a`` (tail = sep||a, or the
whole acc = a), which reproduces classic BPE's non-overlap rule:
after 'a a' merges in 'a a a', the new tail symbol is 'aa', so the
third 'a' cannot re-merge.  Ties in pair counts break on the pair
string — total order, identical both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import TOKENS_EXPR, TOKENS_SQL, load

BPE_MERGES = 3
BPE_VOCAB_CAP = 5000
SEP = "\x1f"

#: symbols string from a token: chars joined by the separator
_SYMS_EXPR = (
    "array_join(transform(sequence(1, length(token)),"
    " i -> substring(token, i, 1)), char(31))"
)

#: adjacent symbol pairs of the current word (empty for 1-symbol words)
_PAIRS_EXPR = (
    "CASE WHEN size(sa) >= 2 THEN"
    " transform(sequence(1, size(sa) - 1),"
    " i -> struct(element_at(sa, i) AS a, element_at(sa, i + 1) AS b))"
    " ELSE array() END"
)


def _merge_fold_expr(a: str, b: str) -> str:
    """Spark fold: merge every left-to-right non-overlapping (a, b)
    symbol pair in ``syms``.  a/b are [a-z0-9]+ symbols — literal-safe."""
    tail = f"concat(char(31), '{a}')"
    return (
        "aggregate(split(syms, char(31)), CAST('' AS STRING),"
        " (acc, x) -> CASE"
        " WHEN acc = '' THEN x"
        f" WHEN x = '{b}' AND (acc = '{a}' OR endswith(acc, {tail}))"
        "  THEN concat(acc, x)"
        " ELSE concat(acc, char(31), x) END)"
    )


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ``BPE_MERGES`` learned merge rules:
    (step, sym_a, sym_b, merged, pair_count)."""
    from .common import persist_tracked

    docs = load(spark, sf_dir, "documents", parallelize=True)
    vocab = (
        docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(BPE_VOCAB_CAP)
    )
    words = persist_tracked(
        vocab.select("cnt", F.expr(_SYMS_EXPR).alias("syms"))
    )
    merges = []
    for step in range(1, BPE_MERGES + 1):
        top = (
            words.withColumn("sa", F.expr("split(syms, char(31))"))
            .select("cnt", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .first()
        )
        if top is None:
            # no pair left to merge (every word is one symbol) — the
            # oracle's t{s} CTE is empty at the same step, so both
            # engines emit the same shortened merge table
            break
        merges.append(
            (step, top["a"], top["b"], top["a"] + top["b"], int(top["c"]))
        )
        words = persist_tracked(
            words.select(
                "cnt",
                F.expr(_merge_fold_expr(top["a"], top["b"])).alias("syms"),
            )
        )
    return spark.createDataFrame(
        merges,
        "step int, sym_a string, sym_b string, merged string,"
        " pair_count bigint",
    )


def _sql_merge_fold(t: str) -> str:
    """DuckDB fold mirroring _merge_fold_expr with the winning pair
    taken from the 1-row CTE ``t`` (cross-joined in)."""
    return (
        "list_reduce(list_prepend('', string_split(syms, chr(31))),"
        " (acc, x) -> CASE"
        " WHEN acc = '' THEN x"
        f" WHEN x = {t}.b AND (acc = {t}.a"
        f"  OR ends_with(acc, chr(31) || {t}.a))"
        "  THEN acc || x"
        " ELSE acc || chr(31) || x END)"
    )


def _sql_pair_counts(w: str) -> str:
    return f"""
  SELECT sa[i] AS a, sa[i + 1] AS b, CAST(sum(cnt) AS BIGINT) AS c
  FROM (SELECT cnt, string_split(syms, chr(31)) AS sa FROM {w}),
       unnest(generate_series(1, len(sa) - 1)) AS u(i)
  GROUP BY sa[i], sa[i + 1]
"""


def _bpe_sql() -> str:
    its = []
    for s in range(1, BPE_MERGES + 1):
        its.append(f"pc{s} AS ({_sql_pair_counts(f'w{s}')})")
        its.append(
            f"t{s} AS (SELECT a, b, c FROM pc{s}"
            " ORDER BY c DESC, a, b LIMIT 1)"
        )
        if s < BPE_MERGES:
            its.append(
                f"w{s + 1} AS (SELECT cnt, {_sql_merge_fold(f't{s}')}"
                f" AS syms FROM w{s}, t{s})"
            )
    selects = "\nUNION ALL\n".join(
        f"SELECT {s} AS step, a AS sym_a, b AS sym_b,"
        f" a || b AS merged, c AS pair_count FROM t{s}"
        for s in range(1, BPE_MERGES + 1)
    )
    iter_ctes = ",\n".join(its)
    return f"""
WITH tok AS (
  SELECT unnest({TOKENS_SQL}) AS token FROM documents
),
vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt
  FROM tok GROUP BY token ORDER BY cnt DESC, token LIMIT {BPE_VOCAB_CAP}
),
w1 AS (
  SELECT cnt,
         array_to_string(list_transform(generate_series(1, length(token)),
                                        i -> substring(token, i, 1)),
                         chr(31)) AS syms
  FROM vocab
),
{iter_ctes}
{selects}
"""


BPE_TRAIN_SQL = _bpe_sql()

QUERIES = {"bpe_train": bpe_train}
ORACLES = {"bpe_train": BPE_TRAIN_SQL}
