"""BPE tokenizer training: merge rules equal a reference python BPE
(classic Sennrich word-frequency algorithm), the left-to-right
non-overlap rule holds, and the corpus touches only phase 1."""

import pytest
from pyspark.sql import functions as F

import docwire_spark.ops.bpe as B

SF = "/root/testdata/sf0.001"


def _python_bpe(word_counts: dict, n_merges: int):
    """Reference implementation: Sennrich et al. 2016, fig. 1."""
    words = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + c
                )
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((step, a, b, a + b, c))
        nxt = {}
        for syms, cnt in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            nxt[tuple(merged)] = nxt.get(tuple(merged), 0) + cnt
        words = nxt
    return out


def _run_on_texts(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return B.bpe_train(spark, str(tmp_path)).collect()


def test_matches_reference_bpe(spark, tmp_path):
    texts = [
        "lower lower lower newest newest newest newest widest widest",
        "lowest lowest newest wider wider low low low",
    ]
    import re

    wc = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    expected = _python_bpe(wc, B.BPE_MERGES)
    got = [
        (r.step, r.sym_a, r.sym_b, r.merged, r.pair_count)
        for r in sorted(_run_on_texts(spark, tmp_path, texts),
                        key=lambda r: r.step)
    ]
    assert got == expected


def test_non_overlap_rule(spark, tmp_path):
    """'aaaa' with top pair (a, a) must merge to (aa, aa) — two
    non-overlapping merges, never three."""
    rows = _run_on_texts(spark, tmp_path, ["aaaa aaaa aaaa"])
    by_step = {r.step: r for r in rows}
    assert (by_step[1].sym_a, by_step[1].sym_b) == ("a", "a")
    # step 2 top pair must be (aa, aa) — i.e. step 1 produced exactly
    # two 'aa' symbols per word, proving non-overlapping merges
    assert (by_step[2].sym_a, by_step[2].sym_b) == ("aa", "aa")
    assert by_step[2].pair_count == 3  # one (aa,aa) pair per word
    # step 3 has nothing left to merge: the table ends early
    assert len(rows) == 2


def test_real_corpus_produces_full_merge_table(spark):
    rows = B.bpe_train(spark, SF).collect()
    assert len(rows) == B.BPE_MERGES
    steps = sorted(r.step for r in rows)
    assert steps == list(range(1, B.BPE_MERGES + 1))
    for r in rows:
        assert r.merged == r.sym_a + r.sym_b
        assert r.pair_count > 0


def _python_encode(text, merges):
    """Greedy in-merge-order application (matches the fold chain)."""
    import re

    out = []
    for w in re.findall(r"[a-z0-9]+", text.lower()):
        syms = list(w)
        for _, a, b, _m, _c in merges:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(syms)
    return out


def test_encode_matches_python_reference(spark, tmp_path):
    texts = [
        "lower lower lower newest newest newest newest widest widest",
        "lowest lowest newest wider wider low low low",
        "zz qq",  # untouched by any merge
        "",       # empty doc -> 0 words, 0 subwords
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    merges = B._train_merges(spark, str(tmp_path))
    got = {r.doc_id: r for r in B.bpe_encode(spark, str(tmp_path)).collect()}
    for i, t in enumerate(texts):
        exp = _python_encode(t, merges)
        r = got[i]
        assert r.n_subwords == len(exp), (i, exp)
        assert r.n_distinct_subwords == len(set(exp))
        assert r.preview == " ".join(exp[:6])
        # subwords reconstruct the words exactly (no char lost/dup)
        import re
        assert r.n_words == len(re.findall(r"[a-z0-9]+", t.lower()))


def test_train_spark_actions_independent_of_n_merges(spark, monkeypatch):
    """VERDICT r4 #4 'done' gate: Spark work is ONE corpus pass
    regardless of n_merges (the merge loop is driver-local over the
    collected <= BPE_VOCAB_CAP frequency table).  Asserted on the
    SPARK ACTION COUNT, not wall clock — this box's noisy neighbor
    makes wall-ratio assertions flaky (BENCH/BASELINE.md appendix),
    and the actual claim is 'no per-merge Spark job'."""
    # Spark 4 splits the API: the CLASSIC class carries the executing
    # collect(); patching the pyspark.sql.DataFrame base misses it
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    calls = {"n": 0}
    orig = _DF.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(_DF, "collect", counting)
    monkeypatch.setattr(B, "BPE_MERGES", 3)
    m3 = B._train_merges(spark, SF)
    n3, calls["n"] = calls["n"], 0
    monkeypatch.setattr(B, "BPE_MERGES", 30)
    m30 = B._train_merges(spark, SF)
    n30 = calls["n"]
    # greedy BPE is deterministic: the longer run extends the shorter
    assert m30[: len(m3)] == m3
    assert len(m30) == 30
    assert n3 == n30 == 1, (n3, n30)  # one vocab collect, zero per merge


def test_encode_plan_is_shuffle_free_map_pass(spark):
    """Encoding itself must add no Exchange beyond the scan-side
    repartition load() applies: the model is inlined, data never
    shuffles."""
    df = B.bpe_encode(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one Exchange from load(parallelize=True)'s right-sizing only
    assert plan.count("Exchange") <= 1, plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("tag,docs", [
    # fewer learnable merges than BPE_MERGES: every token 1 char
    ("zero", [(0, "a b c", "en", "s0", 5), (1, "x y z", "en", "s1", 5)]),
    # exactly one learnable merge
    ("one", [(0, "ab ab ab", "en", "s0", 8), (1, "c d", "en", "s1", 3)]),
    # token-less corpus (NULL + empty text)
    ("empty", [(0, None, "en", "s0", 0), (1, "", "en", "s1", 0)]),
])
def test_bpe_oracles_on_merge_starved_corpora(spark, tmp_path, tag, docs):
    """The encode oracle cross-joins documents with every t1..tN merge
    CTE; a corpus with fewer than BPE_MERGES learnable merges must NOT
    collapse it to 0 rows (the inert-sentinel padding) — Spark emits
    one row per document regardless, and both engines must agree."""
    import os

    import duckdb

    from tools.check_oracles import value_hash

    d = str(tmp_path / tag)
    os.makedirs(d)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(d, 'documents.parquet', '*.parquet')}'"
    )
    for name, fn, sql in (("bpe_train", B.bpe_train, B.BPE_TRAIN_SQL),
                          ("bpe_encode", B.bpe_encode, B.BPE_ENCODE_SQL)):
        df = fn(spark, d)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        res = con.execute(sql)
        ocols = [c[0] for c in res.description]
        orows = res.fetchall()
        assert sorted(cols) == sorted(ocols), (tag, name)
        assert len(rows) == len(orows), (tag, name, len(rows), len(orows))
        assert value_hash(rows, cols) == value_hash(orows, ocols), (tag, name)
    if tag != "one":
        # encode must still emit one row per document
        assert len(B.bpe_encode(spark, d).collect()) == len(docs)
