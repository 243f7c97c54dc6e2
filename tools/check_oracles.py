"""Local replica of the driver's correctness gate: run every entry in
``queries()`` on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(val):
    import datetime
    import math
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.9g}"
    if isinstance(val, datetime.datetime):
        return val.isoformat()
    return repr(val)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main(selected: list[str]) -> int:
    import __spark_entry__ as entrymod
    from valico_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if selected and name not in selected:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {type(e).__name__}: "
                  f"{str(e)[:500]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {type(e).__name__}: "
                  f"{str(e)[:500]}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"[FAIL] {name}: columns differ: spark={scols} "
                  f"duck={dcols}")
            ok = False
        elif len(srows) != len(drows):
            print(f"[FAIL] {name}: row count spark={len(srows)} "
                  f"duck={len(drows)}")
            ok = False
        else:
            ms = rows_to_multiset(srows, scols)
            md = rows_to_multiset(drows, dcols)
            if ms != md:
                only_s = [k for k in ms if ms[k] != md.get(k, 0)][:5]
                only_d = [k for k in md if md[k] != ms.get(k, 0)][:5]
                print(f"[FAIL] {name}: value mismatch; "
                      f"spark-only={only_s} duck-only={only_d}")
                ok = False
        if ok:
            print(f"[ok] {name}: {len(srows)} rows")
        else:
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
