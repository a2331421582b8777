"""Driver-style correctness check: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names/order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as ENTRY
    from docwire_spark.spark.session import build_session

    spark = build_session(master="local[8]", app_name="check_oracles",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = ENTRY.queries(), ENTRY.oracle_sql()
    failed = []
    from docwire_spark.ops.common import release_persisted

    for name, fn in qs.items():
        if only and name not in only:
            continue
        release_persisted()  # free tables cached by the previous query
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"OK?  {name}: rows={len(rows)} (no oracle, rows-only)")
            continue
        try:
            ores = con.execute(os_[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if not problems:
            hs, ho = value_hash(rows, cols), value_hash(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                order_s = sorted(range(len(cols)), key=lambda i: cols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x1f".join(norm_cell(r[i]) for i in order_s) for r in rows)
                lo = sorted("\x1f".join(norm_cell(r[i]) for i in order_o) for r in orows)
                diffs = [(a, b) for a, b in zip(ls, lo) if a != b][:3]
                for a, b in diffs:
                    print(f"   spark:  {a[:200]!r}")
                    print(f"   duckdb: {b[:200]!r}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"PASS {name} ({dt:.1f}s): rows={len(rows)}")
    spark.stop()
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
