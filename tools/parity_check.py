"""Local stand-in for the driver's correctness gate: run each
``__spark_entry__.queries()`` entry against its ``oracle_sql()`` DuckDB twin
and compare row count + column names + sorted values.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, '.')

TABLES = 'region nation customer supplier part orders lineitem events documents embeddings'.split()


def duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return 'nan'
        return round(v, 9)
    if hasattr(v, 'isoformat'):
        return v.isoformat()
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def compare(name, spark_df, con, sql):
    scols = sorted(spark_df.columns)
    srows = sorted(tuple(norm(r[c]) for c in scols) for r in spark_df.collect())
    dcols, draw = duck_result(con, sql)
    order = [dcols.index(c) for c in sorted(dcols)]
    drows = sorted(tuple(norm(r[i]) for i in order) for r in draw)
    ok = True
    if scols != sorted(dcols):
        print(f'  [{name}] COLUMN MISMATCH spark={scols} duck={sorted(dcols)}')
        ok = False
    if len(srows) != len(drows):
        print(f'  [{name}] ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}')
        ok = False
    if ok and srows != drows:
        diffs = [(a, b) for a, b in zip(srows, drows) if a != b]
        print(f'  [{name}] VALUE MISMATCH ({len(diffs)} differing rows), first 3:')
        for a, b in diffs[:3]:
            print(f'    spark={a}\n    duck ={b}')
        ok = False
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from scalpel_spark.session import get_spark

    spark = get_spark(app_name='parity-check', master='local[8]', shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    passed = failed = skipped = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f'ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)')
                skipped += 1
                continue
            if compare(name, df, con, oracles[name]):
                print(f'PASS {name} ({time.time()-t0:.1f}s)')
                passed += 1
            else:
                print(f'FAIL {name} ({time.time()-t0:.1f}s)')
                failed += 1
        except Exception as e:
            print(f'ERROR {name}: {type(e).__name__}: {str(e)[:400]}')
            failed += 1
    print(f'\n{passed} passed, {failed} failed, {skipped} rows-only')
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == '__main__':
    main()
