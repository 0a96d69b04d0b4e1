"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir, compare row count, column names, and order-insensitive
values. Usage: python scripts/check_contract.py [sf_dir] [names...]"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        return f"{x:.9g}"
    try:  # decimals from duckdb round()
        import decimal

        if isinstance(x, decimal.Decimal):
            return f"{float(x):.9g}"
    except ImportError:
        pass
    return repr(x)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from linkgraph import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("contract-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(rows)} rows, cols={cols} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {str(e)[:300]}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: cols {sorted(cols)} vs oracle {sorted(ocols)}")
            continue
        a, b = canon(rows, cols), canon(orows, ocols)
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            continue
        if a != b:
            failures.append(name)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            continue
        print(f"OK   {name}: {len(a)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
