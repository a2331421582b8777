"""Semantics + plan tests for url_canonicalize / host_stats / pagerank."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_url_canonicalize_properties(spark):
    from docwire_spark.ops.web import url_canonicalize

    rows = url_canonicalize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        u = r["url_canon"]
        assert u.startswith("https://host"), u       # scheme+host lowered
        assert ":443" not in u                        # default port gone
        assert "www." not in u                        # www alias stripped
        assert "#" not in u                           # fragment gone
        assert "utm_" not in u                        # tracking params gone
        # surviving params are sorted
        q = u.split("?", 1)[1]
        parts = q.split("&")
        assert parts == sorted(parts)
        assert r["n_tracking_removed"] == 2
        assert r["domain"].startswith("example")
        assert r["path_depth"] == 2

    # exact spot-check for doc_id 123
    r = next(x for x in rows if x["doc_id"] == 123)
    assert r["url_canon"] == (
        "https://host23.example4.com/p4/page/?a=1&b=2&id=123"
    )
    assert r["host"] == "host23.example4.com"
    assert r["domain"] == "example4.com"


def test_url_canonicalize_is_map_side_only(spark):
    from docwire_spark.ops import web

    orig = web.load
    try:
        web.load = lambda spark, sf_dir, table, parallelize=False: orig(
            spark, sf_dir, table, False
        )
        plan = _plan(web.url_canonicalize(spark, SF_DIR))
    finally:
        web.load = orig
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_host_stats_consistency(spark):
    from docwire_spark.ops.web import host_stats, url_canonicalize

    stats = {r["domain"]: r for r in host_stats(spark, SF_DIR).collect()}
    total = sum(r["n_docs"] for r in stats.values())
    assert total == url_canonicalize(spark, SF_DIR).count()
    for r in stats.values():
        assert 1 <= r["n_hosts"] <= 50
        assert r["n_tracking"] == 2 * r["n_docs"]


def test_pagerank_mass_and_structure(spark):
    from docwire_spark.ops.graph import DAMPING, pagerank, _edges

    edges = _edges(spark, SF_DIR)
    e = edges.count()
    assert e > 0
    # symmetric edge set: every (s, d) has its (d, s)
    asym = (
        edges.alias("a")
        .join(
            edges.alias("b"),
            (F.col("a.src") == F.col("b.dst"))
            & (F.col("a.dst") == F.col("b.src")),
            "left_anti",
        )
        .count()
    )
    assert asym == 0
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0

    rows = pagerank(spark, SF_DIR).collect()
    n = len(rows)
    # symmetric graph, no dangling nodes: total PageRank mass is
    # conserved at 1.0 (up to the per-iteration rounding)
    mass = sum(r["pagerank"] for r in rows)
    assert abs(mass - 1.0) < 1e-3, mass
    assert all(r["pagerank"] > 0 for r in rows)
    # uniform init on a symmetric graph: score correlates with degree
    by_deg = sorted(rows, key=lambda r: r["deg"])
    lo = sum(r["pagerank"] for r in by_deg[: n // 3]) / (n // 3)
    hi = sum(r["pagerank"] for r in by_deg[-(n // 3):]) / (n // 3)
    assert hi > lo


def test_pagerank_plan_has_no_cartesian(spark):
    from docwire_spark.ops.graph import pagerank

    plan = _plan(pagerank(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def _python_robots_verdict(doc_id: int) -> tuple[str, bool]:
    """Reference longest-prefix / tie-allow-wins evaluation of the
    synthesized rule set for one doc."""
    k = doc_id % 13
    path = f"/p/{doc_id}"
    rules = [
        (f"/p/{(k * 3) % 10}", False),
        (f"/p/{(k * 3) % 10}{(k + 1) % 10}", True),
        ("/q", False),
    ]
    if k % 4 == 0:
        rules.append((f"/p/{(k * 3) % 10}", True))
    cand = [(p, a) for p, a in rules if path.startswith(p)]
    if not cand:
        return "", True
    best = max(cand, key=lambda pa: (len(pa[0]), pa[1]))
    return best


def test_robots_longest_match_and_tie_semantics(spark):
    from docwire_spark.ops.web import robots_filter

    rows = {
        int(r.url.rsplit("/", 1)[1]): r
        for r in robots_filter(spark, SF_DIR).collect()
    }
    assert len(rows) == 500
    verdicts = set()
    for doc_id, r in rows.items():
        exp_prefix, exp_allow = _python_robots_verdict(doc_id)
        assert (r.matched_prefix, r.allowed) == (exp_prefix, exp_allow), doc_id
        verdicts.add((r.matched_prefix != "", r.allowed))
    # the synthesized corpus must exercise all three outcome classes:
    # matched+denied, matched+allowed (override or tie), unmatched+allowed
    assert (True, False) in verdicts
    assert (True, True) in verdicts
    assert (False, True) in verdicts


def test_robots_plan_broadcasts_rules_no_corpus_window(spark):
    from docwire_spark.ops.web import robots_filter

    plan = _plan(robots_filter(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan  # verdict is a per-row fold, not a window
    assert "SortMergeJoin" not in plan


def test_link_graph_extracts_every_outlink(spark):
    from docwire_spark.ops.graph import link_graph

    edges = link_graph(spark, SF_DIR).collect()
    # 2 anchors per document, recovered through the real kernel's spans
    assert sum(e.n_links for e in edges) == 2 * 500
    for e in edges:
        assert e.src_host.startswith("crawl")
        assert e.dst_host.endswith(".example")
        assert 1 <= e.n_distinct_targets <= e.n_links


def test_anchor_text_exact_reconstruction(spark):
    from docwire_spark.ops.common import load
    from docwire_spark.ops.graph import _AT_L1, _AT_L2, _LG_HOSTS, _LG_PATHS
    from docwire_spark.ops.graph import anchor_text

    ids = [r.doc_id for r in
           load(spark, SF_DIR, "documents").select("doc_id").collect()]
    expected: dict[tuple, list] = {}
    for i in ids:
        for h, p, label in (
            ((i * 3 + 1) % _LG_HOSTS, (i * 7 + 1) % _LG_PATHS,
             f"ref-{i % _AT_L1}"),
            ((i * 5 + 2) % _LG_HOSTS, (i * 11 + 5) % _LG_PATHS,
             f"lbl-{i % _AT_L2}"),
        ):
            key = (f"https://crawl{h}.example/p/{p}", label)
            expected.setdefault(key, []).append(f"crawl{i % _LG_HOSTS}.example")
    got = {
        (r.dst_url, r.label): (r.n_anchors, r.n_hosts)
        for r in anchor_text(spark, SF_DIR).collect()
    }
    assert got == {
        k: (len(v), len(set(v))) for k, v in expected.items()
    }


def test_anchor_text_span_pairing_edge_cases(spark):
    """The pairing invariant at the kernel level: a link's label is
    the text span starting exactly at the link span's end; a link at
    document end (no successor) contributes nothing; adjacent links
    pair with their own labels, not each other."""
    from docwire_spark.kernel.api import extract

    r = extract(
        b'<html><body><p><a href="https://a.x/1">one</a>'
        b'<a href="https://a.x/2">two</a></p>'
        b'<p><a href="https://a.x/3"></a>tail</p></body></html>',
        url="t.html",
    )
    text = r.text.decode("utf-8")
    spans = list(r.spans)
    pairs = []
    for i, s in enumerate(spans):
        if s[2] != "link":
            continue
        nxt = spans[i + 1] if i + 1 < len(spans) else None
        if nxt and nxt[2] == "text" and nxt[0] == s[1]:
            pairs.append((text[s[0] + 1:s[1] - 1], text[nxt[0]:nxt[1]]))
    # empty-label anchor attributes the following text run ('tail') —
    # the documented behavior (span stream carries no label metadata)
    assert pairs == [
        ("https://a.x/1", "one"),
        ("https://a.x/2", "two"),
        ("https://a.x/3", "tail"),
    ]


def test_redirect_chains_semantics(spark):
    from docwire_spark.ops.common import load
    from docwire_spark.ops.web import _RC_GROUP, redirect_chains

    ids = [r.doc_id for r in
           load(spark, SF_DIR, "documents").select("doc_id").collect()]
    rows = {r.url: r for r in redirect_chains(spark, SF_DIR).collect()}
    n_redirecting = sum(1 for i in ids if i % _RC_GROUP != 0)
    assert len(rows) == n_redirecting
    for i in ids:
        u = f"https://r.example/u/{i}"
        if i % _RC_GROUP == 0:
            assert u not in rows          # terminals don't redirect
        else:
            r = rows[u]
            assert r.final_url == f"https://r.example/u/{i - i % _RC_GROUP}"
            assert r.n_hops == i % _RC_GROUP


def test_redirect_doubling_round_count_is_logarithmic(spark):
    from docwire_spark.ops.web import resolve_redirects

    # one 20-hop chain: doubling spans 2,4,8,16,32 -> 5 rounds, not 20
    edges = [(f"u{i}", f"u{i - 1}") for i in range(1, 21)]
    m = spark.createDataFrame(edges, "src string, dst string")
    resolved, rounds = resolve_redirects(m)
    assert rounds == 5
    got = {r.url: (r.final_url, r.n_hops) for r in resolved.collect()}
    assert got == {f"u{i}": ("u0", i) for i in range(1, 21)}


def test_redirect_chains_plan_is_equi_join_only(spark):
    from docwire_spark.ops.web import redirect_chains

    plan = _plan(redirect_chains(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_frontier_schedule_politeness_invariants(spark):
    from collections import defaultdict

    from docwire_spark.ops.web import (
        FRONTIER_CRAWLERS, FRONTIER_DEPTH, frontier_schedule,
    )

    rows = frontier_schedule(spark, SF_DIR).collect()
    assert rows
    by_host = defaultdict(list)
    for r in rows:
        by_host[r.host].append(r)
        assert 0 <= r.crawler < FRONTIER_CRAWLERS
    # the corpus must actually exercise the depth cap
    assert any(len(v) == FRONTIER_DEPTH for v in by_host.values())
    for host, members in by_host.items():
        # one crawler per host; rounds dense from 1; ordered by
        # (priority desc, url asc); never deeper than the cap
        assert len({r.crawler for r in members}) == 1
        assert len(members) <= FRONTIER_DEPTH
        members.sort(key=lambda r: r.fetch_round)
        assert [r.fetch_round for r in members] == list(
            range(1, len(members) + 1)
        )
        ordered = sorted(members, key=lambda r: (-r.priority, r.url))
        assert [r.url for r in ordered] == [r.url for r in members]


def test_frontier_two_phase_topk_equals_single_window(spark):
    """The skew-guard decomposition is EXACT: phase-1 local top-K
    never drops a global top-K row, whatever the input partitioning."""
    from pyspark.sql import Window

    from docwire_spark.ops import web
    from docwire_spark.ops.web import FRONTIER_DEPTH, frontier_schedule

    got = {
        (r.url, r.fetch_round)
        for r in frontier_schedule(spark, SF_DIR).collect()
    }
    # single-window reference on the same candidate derivation
    from docwire_spark.ops.bloom import hash_expr
    from docwire_spark.ops.common import load

    cand = load(spark, SF_DIR, "documents").selectExpr(
        web._FR_HOST.format(s="STRING") + " AS host", "doc_id"
    ).selectExpr("host", web._FR_URL.format(s="STRING") + " AS url")
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("url")
    )
    ref = cand.selectExpr(
        "host", "url", f"{hash_expr('url', 0, 1000)} AS priority"
    ).withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= FRONTIER_DEPTH
    )
    assert got == {(r.url, r.rn) for r in ref.collect()}


def test_frontier_plan_two_windows_no_cartesian(spark):
    from docwire_spark.ops.web import frontier_schedule

    plan = _plan(frontier_schedule(spark, SF_DIR))
    assert plan.count("Window") >= 2  # the two-phase decomposition
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
