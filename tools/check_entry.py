"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value multiset. Usage:

    python tools/check_entry.py [sf_dir] [query ...]

DECIMAL OUTPUT BAN (round-5 hardening): round 4 shipped DECIMAL-typed
readouts that this gate's ``str()`` normalization could not
distinguish from doubles, while the driver's hash protocol could
(fixed-scale ``1.0000`` vs shortest-repr ``1.0``) — 5 driver reds the
replica called green. The gate now FAILS any query whose Spark output
schema or oracle result contains a decimal type/cell: decimals are for
internal arithmetic only and must be cast to DOUBLE at the output
boundary (lakehouse/stablemath.py docstring).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def decimal_problems(df, ocols, orows):
    """The class the driver catches and ``str()``-normalization can't:
    any decimal in either side's output. Spark side is schema-typed;
    DuckDB's DB-API description types everything numeric as 'NUMBER',
    so the oracle side is detected by cell type (first non-null cell
    per column — decimal typing is uniform within a column)."""
    import decimal

    out = []
    bad = [
        f.name
        for f in df.schema.fields
        if "decimal" in f.dataType.simpleString()
    ]
    if bad:
        out.append(
            f"spark output has DECIMAL column(s) {bad} — cast to DOUBLE "
            "at the output boundary (stablemath.py)"
        )
    pending = set(range(len(ocols)))
    obad = set()
    for r in orows:
        if not pending:
            break
        for i in list(pending):
            v = r[i]
            if v is None:
                continue
            if isinstance(v, decimal.Decimal):
                obad.add(ocols[i])
            pending.discard(i)
    if obad:
        out.append(
            f"oracle output has DECIMAL column(s) {sorted(obad)} — "
            "cast the oracle SQL to DOUBLE"
        )
    return out


def fingerprint(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return normed


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from lakehouse.session import build_session

    spark = build_session(
        "check-entry", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            probs = decimal_problems(df, [], [])
            if probs:
                print(f"FAIL {name}: {'; '.join(probs)}")
                n_fail += 1
            else:
                print(f"ok   {name}: rows-only, {len(rows)} rows ({dt:.1f}s)")
                n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: oracle error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = decimal_problems(df, ocols, orows)
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if not problems:
            fa, fb = fingerprint(rows, cols), fingerprint(orows, ocols)
            if fa != fb:
                diff_a = [r for r in fa if r not in set(map(tuple, fb))][:3]
                diff_b = [r for r in fb if r not in set(map(tuple, fa))][:3]
                problems.append(
                    f"values differ; spark-only={diff_a} oracle-only={diff_b}"
                )
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(rows)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
