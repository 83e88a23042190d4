"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.01 on Spark, run its oracle_sql() on DuckDB over the same
parquet, and compare row count, schema width, and order-insensitive
values (column-name-sorted, stringified, sorted rows).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_val(row[i]) for i in order))
    out.sort(key=repr)
    return [c for c in sorted(colnames)], out


def _norm_val(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return repr(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pprl_spark.spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]")

    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            status = "rows-only"
            ok = len(s_rows) >= 0
            print(f"ok    {name:32s} rows={len(s_rows):6d}  {wall:5.1f}s  [{status}]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        s_c, s_v = normalize([tuple(r) for r in s_rows], s_cols)
        d_c, d_v = normalize(d_rows, d_cols)
        if s_c != d_c:
            failures.append(name)
            print(f"FAIL  {name}: schema mismatch {s_c} vs {d_c}")
        elif len(s_v) != len(d_v):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(s_v)} vs {len(d_v)}")
        elif s_v != d_v:
            failures.append(name)
            diff = [i for i, (a, b) in enumerate(zip(s_v, d_v)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {diff}")
            for i in diff:
                print(f"      spark : {s_v[i]}")
                print(f"      duckdb: {d_v[i]}")
        else:
            print(f"ok    {name:32s} rows={len(s_v):6d}  {wall:5.1f}s  [oracle]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
