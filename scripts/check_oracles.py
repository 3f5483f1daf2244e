"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01 (or a given dir), compare
row count, column names, order-insensitive values, AND pandas dtype parity
(the driver canonicalizes both frames through pandas before hashing, so an
oracle column surfacing as float64 against Spark's int64 hash-mismatches
even when the values are numerically identical — this bit three rounds of
oracles before the lint below).

Usage: python scripts/check_oracles.py [--json out.json] [sf_dir] [query ...]
Env:   LEVSIM_ORACLE_PROFILE=1  -> print per-query spark/duck seconds and a
                                   slowest-first summary at the end.

--json writes the per-query artifact (status, row count, spark/duck
seconds) committed at round close as CORRECTNESS_local_r{N}.json — the
auditable counterpart of the builder's "local gate ALL OK" claim
(round-4 VERDICT #6).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from levsim.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def df_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return lines


def dtype_kind(v):
    """Coarse dtype class as the driver's pandas canonicalizer sees it.

    bool is its own class (pandas sorts/hashes it distinctly); int and
    float MUST NOT mix (the r2/r3 HUGEINT->float64 bug class); anything
    unhashable (list/dict/ndarray) breaks pandas sort_values outright.
    """
    import datetime

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, (str, bytes, bytearray)):
        return "str"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return "datetime"
    if isinstance(v, (list, dict, set, tuple)) or type(v).__name__ == "ndarray":
        return "UNHASHABLE"
    return type(v).__name__


def dtype_lint(name, scols, srows, ocols, orows):
    """Return list of problem strings: cross-engine dtype-class mismatches
    and unhashable (array/struct) cells on either side."""
    problems = []

    def col_kinds(cols, rows):
        kinds = {}
        for c_i, c in enumerate(cols):
            k = None
            for r in rows:
                k = dtype_kind(r[c_i])
                if k is not None:
                    break
            kinds[c] = k
        return kinds

    sk, ok_ = col_kinds(scols, srows), col_kinds(ocols, orows)
    for c in sorted(set(sk) & set(ok_)):
        a, b = sk[c], ok_[c]
        if a == "UNHASHABLE" or b == "UNHASHABLE":
            problems.append(f"col {c!r}: UNHASHABLE cell (spark={a}, duck={b}) — pandas sort_values will crash")
        elif a is not None and b is not None and a != b:
            problems.append(f"col {c!r}: dtype-class mismatch spark={a} duck={b} — driver hash WILL differ")
    return problems


def main():
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    profile = os.environ.get("LEVSIM_ORACLE_PROFILE", "") not in ("", "0")
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    timings = []
    records = {}
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            lint = dtype_lint(name, scols, srows, scols, srows)
            tag = " LINT:" + "; ".join(lint) if lint else ""
            print(f"{name:24s} rows-only: {len(srows)} rows, cols {scols}{tag}")
            timings.append((name, t_spark, 0.0))
            records[name] = {"status": "lint_fail" if lint else "rows_only",
                             "rows": len(srows), "spark_s": round(t_spark, 2),
                             "duck_s": None}
            if lint:
                failures.append(name)
            continue
        t1 = time.time()
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            failures.append(name)
            timings.append((name, t_spark, time.time() - t1))
            records[name] = {"status": "oracle_sql_error", "rows": len(srows),
                             "spark_s": round(t_spark, 2), "duck_s": None}
            continue
        t_duck = time.time() - t1
        timings.append((name, t_spark, t_duck))
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"{name:24s} SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"{name:24s} COUNT MISMATCH spark={len(srows)} duck={len(orows)}")
            ok = False
        else:
            lint = dtype_lint(name, scols, srows, ocols, orows)
            if lint:
                print(f"{name:24s} DTYPE LINT FAIL: " + "; ".join(lint))
                ok = False
            ssig = df_signature(scols, srows)
            osig = df_signature(ocols, orows)
            if ssig != osig:
                diffs = [(a, b) for a, b in zip(ssig, osig) if a != b][:5]
                print(f"{name:24s} VALUE MISMATCH ({sum(1 for a, b in zip(ssig, osig) if a != b)} rows)")
                for a, b in diffs:
                    print(f"   spark: {a}\n   duck : {b}")
                ok = False
        if ok:
            extra = f" [spark {t_spark:.2f}s duck {t_duck:.2f}s]" if profile else ""
            print(f"{name:24s} OK ({len(srows)} rows){extra}")
        else:
            failures.append(name)
        records[name] = {"status": "ok" if ok else "FAIL", "rows": len(srows),
                         "spark_s": round(t_spark, 2), "duck_s": round(t_duck, 2)}
    wall = time.time() - t_start
    if profile:
        print("\n-- slowest queries (spark_s, duck_s, total_s) --")
        for name, ts, td in sorted(timings, key=lambda x: -(x[1] + x[2]))[:15]:
            print(f"  {name:28s} {ts:7.2f} {td:7.2f} {ts + td:7.2f}")
        print(f"  TOTAL wall {wall:.1f}s over {len(timings)} queries")
    print("\nRESULT:", "ALL OK" if not failures else f"FAILURES: {failures}")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump({
                "sf_dir": sf_dir,
                "wall_s": round(wall, 1),
                "n_queries": len(records),
                "n_ok": sum(1 for r in records.values() if r["status"] == "ok"),
                "n_rows_only": sum(1 for r in records.values()
                                   if r["status"] == "rows_only"),
                "failures": failures,
                "queries": records,
            }, fh, indent=1)
        print(f"artifact written: {json_path}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
