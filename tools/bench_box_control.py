"""Box-delivery control for the scaling gate: run the IDENTICAL
per-document pipeline (Arrow decode -> kernel extract -> Arrow encode)
under plain multiprocessing — no Spark, no JVM — at the same bound-CPU
budgets as the two bench_scaling legs (3 vs 12 host CPUs for the
2-core-executor pair).

Purpose: separate the job's scaling from the sandbox box's.  On a real
cluster each executor owns its node's memory channels; in this sandbox
all "executors" share one socket AND a noisy neighbor steals a
time-varying third-to-half of CPU at mid/high widths (see
BENCH/BASELINE.md "Box variance" appendix).  If this control — which
has zero Spark machinery — scales at e < 1 between the same two CPU
budgets, then e bounds what ANY perfectly-parallel job can show on
this box, and the honest job-attributable efficiency is
(spark_efficiency / control_efficiency).

Each worker is taskset-bound by inheritance (the whole process tree is
launched under taskset).  Workers pull fixed-size batches of the same
deterministic corpus pages bench_scaling uses, run
kernel.api.extract() per page, and count docs; throughput = total
docs / wall.  Batches are pre-materialized so generation cost is
excluded from the timed window, mirroring extract_job's corpus cache.

Usage: python tools/bench_box_control.py [--n-docs 60000]
       [--budgets 3,12]
       [--single-budget 3]   # one leg only: lets bench_scaling
                             # interleave each control adjacent in
                             # time to its matching Spark leg
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(pages):
    from docwire_spark.kernel.api import extract

    n = 0
    for url, html in pages:
        extract(html, url=url)
        n += 1
    return n


def run_width(n_docs: int, width: int) -> float:
    """Docs/sec for `width` worker processes over the same corpus."""
    from docwire_spark.spark.corpus import generate_rows

    rows = [(r[0], r[2]) for r in generate_rows(n_docs, n_hosts=50, seed=42)]
    chunks = [rows[i::width] for i in range(width)]
    with mp.get_context("spawn").Pool(width) as pool:
        # warm: imports + allocator per worker, outside the window
        pool.map(_worker, [c[:20] for c in chunks])
        t0 = time.time()
        counts = pool.map(_worker, chunks)
        wall = time.time() - t0
    assert sum(counts) == n_docs
    return n_docs / wall


def run_budget(cpus: int, n_docs: int) -> dict:
    """Run the control for ONE bound-CPU budget in a taskset child;
    raise (with the child's stderr tail) rather than hide a crash —
    a broken control must never read as a perfect one."""
    env = dict(os.environ,
               _BOX_CONTROL_CHILD="1",
               # 2 workers per 3 bound CPUs: the same task-slot to
               # CPU-budget ratio as the bench_scaling legs (each
               # 2-core executor gets cores+1 host CPUs), so the
               # worker counts mirror Spark's 2 vs 8 task slots
               _BOX_CONTROL_WIDTH=str(max(1, cpus * 2 // 3)))
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.abspath(__file__), "--n-docs", str(n_docs)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"box-control child (budget {cpus}) failed: "
            f"rc={out.returncode}\nstdout: {out.stdout[-1000:]}\n"
            f"stderr: {out.stderr[-1000:]}"
        )
    res = json.loads(lines[-1])
    res["budget_cpus"] = cpus
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=60_000)
    ap.add_argument("--budgets", default="3,12",
                    help="bound host-CPU budgets, low,high (must match "
                         "the bench_scaling taskset budgets)")
    ap.add_argument("--single-budget", type=int, default=None,
                    help="run only this one budget and print its JSON "
                         "(for interleaving with the Spark legs)")
    args = ap.parse_args()

    if os.environ.get("_BOX_CONTROL_CHILD"):
        # child re-exec under taskset: run one width and print JSON
        width = int(os.environ["_BOX_CONTROL_WIDTH"])
        thr = run_width(args.n_docs, width)
        print(json.dumps({"width": width, "docs_per_sec": round(thr, 1)}))
        return

    if args.single_budget is not None:
        print(json.dumps(run_budget(args.single_budget, args.n_docs)))
        return

    low_cpus, high_cpus = (int(x) for x in args.budgets.split(","))
    results = {}
    for cpus in (low_cpus, high_cpus):
        results[cpus] = run_budget(cpus, args.n_docs)
        print(f"budget {cpus} CPUs -> {results[cpus]}")

    lo, hi = results[low_cpus], results[high_cpus]
    ratio = hi["docs_per_sec"] / lo["docs_per_sec"]
    budget_ratio = high_cpus / low_cpus
    eff = ratio / budget_ratio
    print(json.dumps({
        "control_low": lo, "control_high": hi,
        "budget_ratio": budget_ratio,
        "control_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
