"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at sf0.01, compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, floats rounded to 9dp).

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    import duckdb

    import __spark_entry__ as e
    from intraarchivededuplicator_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, os_ = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            res = con.sql(sql)
            ocols = [c for c in res.columns]
            orows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema mismatch: {scols} vs {ocols}"))
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rowcount {len(srows)} vs {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            continue
        ns, no = normalize(srows, scols), normalize(orows, ocols)
        if ns != no:
            bad = next(
                (i, a, b) for i, (a, b) in enumerate(zip(ns, no)) if a != b
            )
            failures.append((name, f"value mismatch at {bad[0]}: {bad[1]} vs {bad[2]}"))
            print(f"FAIL {name}: first diff {bad[1]} vs {bad[2]}")
            continue
        print(f"PASS {name}: {len(srows)} rows in {dt:.1f}s")

    print(f"\n{len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
