#!/usr/bin/env python3
"""Local oracle harness: verify __spark_entry__.queries() vs oracle_sql().

Mimics the driver's t2 gate: for every name in queries(), run the Spark
query at --sf-dir and the matching oracle_sql() in DuckDB over the same
parquet files (fixture tables pre-registered as views), then compare

  - row count,
  - schema (column names, sorted),
  - order-insensitive value hash (columns sorted by name, rows sorted by
    their stringified tuple, values normalized: floats via repr, NaN/None
    collapsed, timestamps/dates via isoformat).

Exit 0 iff every declared pair matches. Run this before every commit that
touches __spark_entry__.py:

    python scripts/check_oracle.py --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted(
        "\x1f".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\x1e".join(lines).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted_cols), h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", help="subset of query names")
    args = ap.parse_args()

    # Composite entries mkdtemp throwaway TableStores; funnel them into
    # one root removed at exit so repeated runs don't accumulate
    # fixture-sized copies under /tmp.
    import atexit
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="check_oracle_")
    tempfile.tempdir = workdir
    atexit.register(lambda: shutil.rmtree(workdir, ignore_errors=True))

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.only or list(queries)
    failures, no_oracle = [], []
    for name in names:
        fn = queries[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            s_n, s_schema, s_hash = table_hash(scols, srows)
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            failures.append(name)
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            no_oracle.append(name)
            print(f"rows-only  {name}: {s_n} rows ({spark_t:.1f}s, no oracle)")
            continue
        t0 = time.time()
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            o_n, o_schema, o_hash = table_hash(ocols, orows)
        except Exception:
            print(f"FAIL  {name}: oracle sql raised")
            traceback.print_exc()
            failures.append(name)
            continue
        duck_t = time.time() - t0
        ok = (s_n == o_n) and (s_schema == o_schema) and (s_hash == o_hash)
        status = "OK   " if ok else "FAIL "
        print(
            f"{status} {name}: spark {s_n} rows {spark_t:.1f}s | duck {o_n} rows {duck_t:.1f}s"
        )
        if not ok:
            failures.append(name)
            if s_schema != o_schema:
                print(f"      schema spark={s_schema}")
                print(f"      schema duck ={o_schema}")
            if s_n != o_n:
                print(f"      rowcount spark={s_n} duck={o_n}")
            if s_hash != o_hash and s_schema == o_schema and s_n == o_n:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("\x1f".join(norm_value(r[i]) for i in order) for r in srows)
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = sorted("\x1f".join(norm_value(r[i]) for i in order_o) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        print(f"      first diff:\n       spark {a!r}\n       duck  {b!r}")
                        break
    print(
        f"\n{len(names) - len(failures) - len(no_oracle)} ok, "
        f"{len(no_oracle)} rows-only, {len(failures)} FAILED of {len(names)}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
