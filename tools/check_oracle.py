"""Local replica of the driver's correctness gate: run each queries() entry
on Spark at sf0.01, run the matching oracle_sql() in DuckDB over the same
parquet tables, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    import datetime
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main(selected):
    import __spark_entry__ as E
    from mapshaper_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if selected and name not in selected:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            srows = df.collect()
            scols = df.columns
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {ex}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sset = rows_to_set(scols, [tuple(r) for r in srows])
            oset = rows_to_set(ocols, orows)
            if sset != oset:
                extra = {k: v for k, v in sset.items() if oset.get(k) != v}
                miss = {k: v for k, v in oset.items() if sset.get(k) != v}
                problems.append(
                    f"values differ; spark-only {list(extra.items())[:3]} "
                    f"oracle-only {list(miss.items())[:3]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:])))
