"""The inlined cached-key insertion in pdf._sort_elements must make
exactly the decisions of the plain _less comparator scan (the goldens
cover real pages; this covers the None/zero-height edge lattice and
dense synthetic pages)."""

import random

from docwire_spark.kernel.pdf import _less, _sort_elements


def _ref_sort(elements):
    result = []
    for el in elements:
        pos = len(result)
        for i, other in enumerate(result):
            if _less(el, other):
                pos = i
                break
        result.insert(pos, el)
    return result


def _rand_el(rng):
    y = None if rng.random() < 0.05 else rng.uniform(0, 800)
    x = None if rng.random() < 0.05 else rng.uniform(0, 600)
    fs = rng.choice([None, 0, rng.uniform(1, 40)])
    h = rng.choice([None, 0, rng.uniform(1, 40)])
    return ("t", x, y, rng.uniform(1, 100), h, fs)


def test_sort_matches_reference_comparator_scan():
    rng = random.Random(11)
    for _ in range(300):
        els = [_rand_el(rng) for _ in range(rng.randrange(0, 60))]
        assert _sort_elements(els) == _ref_sort(els)


def test_sort_same_line_keeps_x_order_and_insertion_stability():
    # one visual line (same y), shuffled x: must come out x-ascending
    els = [("t", float(x), 100.0, 10.0, 10.0, 10.0) for x in (5, 1, 3, 2, 4)]
    out = _sort_elements(els)
    assert [e[1] for e in out] == [1.0, 2.0, 3.0, 4.0, 5.0]
    # duplicate keys: multiset semantics place later inserts after
    dup = [("a", 1.0, 100.0, 10.0, 10.0, 10.0),
           ("b", 1.0, 100.0, 10.0, 10.0, 10.0)]
    assert [e[0] for e in _sort_elements(dup)] == ["a", "b"]
