"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()`` in
DuckDB at sf0.01, compare row count, sorted column names, and an
order-insensitive canonical value hash. Stricter than any plausible driver
hash: floats are compared by exact bit pattern (after both engines' own
rounding), timestamps at microsecond resolution.

Usage: python tests/oracle_harness.py [name ...]
Exit code 0 iff every oracle-checked query matches and every rows-only
query executes.
"""

from __future__ import annotations

import datetime
import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack(">d", v).hex()
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
    return [columns[i] for i in order], out


def spark_result(spark, fn):
    df = fn(spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def main(argv):
    import duckdb

    import __spark_entry__ as entrymod
    from mortar_parquet_support_spark.session import get_spark

    only = set(argv)
    spark = get_spark("oracle-harness")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd/renamed name must not silently run zero comparisons and
        # exit 0 ("ALL MATCH") — that is a false-green correctness gate
        print(f"UNKNOWN QUERY NAME(S): {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            s_cols, s_rows = spark_result(spark, fn)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_rows)} rows, cols={s_cols}")
            continue
        try:
            d_cols, d_rows = duck_result(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            _, s_canon = canon_rows(s_cols, s_rows)
            _, d_canon = canon_rows(d_cols, d_rows)
            if s_canon != d_canon:
                # MULTISET difference, not positional zip: one extra or
                # differing row would misalign every following pair and
                # report ~all rows as differing, burying the real delta
                # (and a plain set diff would hide multiplicity changes)
                from collections import Counter

                sc, dc = Counter(s_canon), Counter(d_canon)
                s_only = sorted((sc - dc).elements())
                d_only = sorted((dc - sc).elements())
                problems.append(
                    f"values: {len(s_only)} spark-only / {len(d_only)} "
                    f"duck-only rows; spark-only[:3]={s_only[:3]} "
                    f"duck-only[:3]={d_only[:3]}"
                )
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)[:500]}")
        else:
            print(f"[ok] {name}: {len(s_rows)} rows match")
    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
