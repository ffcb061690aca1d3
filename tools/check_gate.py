"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet tables, then
compares row count, column names, and exact values (sorted columns,
sorted rows). Stricter than the driver's value-hash: floats must match
bit-for-bit after canonical string rendering.

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from nutch_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"{name:28s} rows={len(sdf):6d} spark={t1-t0:6.1f}s  (no oracle — rows-only)")
            continue
        odf = con.sql(oracles[name]).df()
        t2 = time.time()
        s, o = canon(sdf), canon(odf)
        ok = True
        msgs = []
        if list(s.columns) != list(o.columns):
            ok = False
            msgs.append(f"cols spark={list(s.columns)} oracle={list(o.columns)}")
        elif len(s) != len(o):
            ok = False
            msgs.append(f"rows spark={len(s)} oracle={len(o)}")
        else:
            for c in s.columns:
                a = s[c]
                b = o[c]
                try:
                    b = b.astype(a.dtype)
                except (TypeError, ValueError):
                    pass
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    ok = False
                    bad = (~eq).idxmax()
                    msgs.append(
                        f"col {c}: first diff row {bad}: "
                        f"spark={a[bad]!r} oracle={b[bad]!r} "
                        f"({int((~eq).sum())} diffs)"
                    )
        status = "OK  " if ok else "FAIL"
        print(
            f"{name:28s} {status} rows={len(s):6d} "
            f"spark={t1-t0:6.1f}s duck={t2-t1:5.1f}s"
        )
        for m in msgs:
            print(f"    {m}")
        if not ok:
            failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
