"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() in DuckDB over the same parquet, compare row
counts and order-insensitive value multisets (columns sorted by name).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

import __spark_entry__ as E
from pprl_spark.spark.session import get_spark


def norm(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return v
    return v


def main():
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracles = E.oracle_sql()
    failures = []
    for name, fn in E.queries().items():
        if ONLY and name not in ONLY:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        import time

        t0 = time.time()
        sdf = fn(spark, SF)
        cols = sorted(sdf.columns)
        srows = sorted(
            tuple(norm(r[c]) for c in cols) for r in sdf.collect()
        )
        t1 = time.time()
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: oracle SQL error: {str(exc)[:200]}")
            failures.append(name)
            continue
        t2 = time.time()
        ocols = sorted(ddf.columns)
        orows = sorted(
            tuple(norm(v) for v in row)
            for row in ddf[ocols].itertuples(index=False, name=None)
        )
        status = "ok"
        if cols != ocols:
            status = f"COLUMN MISMATCH spark={cols} oracle={ocols}"
        elif len(srows) != len(orows):
            status = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            status = f"VALUES differ, first: {diff}"
        tag = "ok  " if status == "ok" else "FAIL"
        print(f"{tag} {name}: rows={len(srows)} spark={t1-t0:.1f}s duck={t2-t1:.1f}s"
              + ("" if status == "ok" else f" :: {status}"))
        if status != "ok":
            failures.append(name)
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
