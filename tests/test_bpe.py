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


def test_train_wall_independent_of_n_merges(spark, monkeypatch):
    """VERDICT r4 #4 'done' gate: Spark work is ONE corpus pass
    regardless of n_merges (the merge loop is driver-local over the
    collected <= BPE_VOCAB_CAP frequency table), so 10x the merges
    must cost well under 2x the wall."""
    import time

    B._train_merges(spark, SF)  # warm (JVM, scan cache)
    monkeypatch.setattr(B, "BPE_MERGES", 3)
    t0 = time.time()
    m3 = B._train_merges(spark, SF)
    t3 = time.time() - t0
    monkeypatch.setattr(B, "BPE_MERGES", 30)
    t0 = time.time()
    m30 = B._train_merges(spark, SF)
    t30 = time.time() - t0
    # greedy BPE is deterministic: the longer run extends the shorter
    assert m30[: len(m3)] == m3
    assert len(m30) == 30
    assert t30 < 2 * t3 + 1.0, (t3, t30)


def test_encode_plan_is_shuffle_free_map_pass(spark):
    """Encoding itself must add no Exchange beyond the scan-side
    repartition load() applies: the model is inlined, data never
    shuffles."""
    df = B.bpe_encode(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one Exchange from load(parallelize=True)'s right-sizing only
    assert plan.count("Exchange") <= 1, plan
    assert "CartesianProduct" not in plan
