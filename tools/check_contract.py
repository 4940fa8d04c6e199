"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count, column-name set, and
order-insensitive values (floats both raw and rounded, to flag
determinism risk before the real driver runs).

Usage: python tools/check_contract.py [--vanilla] [--json OUT] [sf_dir]
                                       [only_query ...]

``--json OUT`` additionally writes a machine-readable artifact: one
row per checked query with status / rows / seconds / problems — the
committed per-round evidence (LOCALCHECK_r<N>.json) for registry
entries outside the driver's 50-row correctness window.

``--vanilla`` builds a plain ``SparkSession`` (no engine confs) — the
same kind of session the driver hands to ``queries()`` — so any hidden
dependency on ``get_spark()``'s configuration fails here first.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cs186_query_optimization_project_spark import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_val(v, ndigits=6):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, ndigits)
        return 0.0 if r == 0 else r
    if hasattr(v, "isoformat"):
        try:
            return v.replace(tzinfo=None).isoformat()
        except TypeError:
            return v.isoformat()
    return v


def canon(rows, colnames, ndigits=6):
    idx = sorted(range(len(colnames)), key=lambda i: colnames[i].lower())
    out = [tuple(norm_val(r[i], ndigits) for i in idx) for r in rows]
    out.sort(key=repr)
    return out


def main():
    argv = list(sys.argv[1:])
    vanilla = "--vanilla" in argv
    if vanilla:
        argv.remove("--vanilla")
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: --json OUT (missing output path)")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    # first positional is sf_dir only if it IS a directory — a bare
    # query name (`check_contract.py table_histogram`) otherwise gets
    # consumed as the data dir and dies with an opaque parquet error
    if argv and os.path.isdir(argv[0]):
        sf_dir, only = argv[0], set(argv[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(argv)
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local[8]")
                 .appName("contract-check-vanilla").getOrCreate())
    else:
        spark = get_spark(app_name="contract-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)}; "
                 f"valid: {sorted(queries)}")
    n_pass = n_fail = n_rowsonly = 0
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} SPARK ERROR: {type(e).__name__}: {e}")
            n_fail += 1
            results[name] = {"status": "fail", "rows": None,
                             "sec": round(time.time() - t0, 2),
                             "problems": [f"SPARK ERROR: "
                                          f"{type(e).__name__}: {e}"]}
            continue
        if name not in oracles:
            print(f"rows  {name:28s} rows-only: {len(spark_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            results[name] = {"status": "rows-only",
                             "rows": len(spark_rows),
                             "sec": round(time.time() - t0, 2),
                             "problems": []}
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} ORACLE ERROR: {e}")
            n_fail += 1
            results[name] = {"status": "fail", "rows": len(spark_rows),
                             "sec": round(time.time() - t0, 2),
                             "problems": [f"ORACLE ERROR: {e}"]}
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(
                f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(c.lower() for c in spark_cols) != sorted(
                c.lower() for c in duck_cols):
            problems.append(f"columns {spark_cols} vs {duck_cols}")
        if not problems:
            a = canon(spark_rows, spark_cols)
            b = canon(duck_rows, duck_cols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diffs}")
            else:
                # determinism canary: compare at full precision too
                a12 = canon(spark_rows, spark_cols, 12)
                b12 = canon(duck_rows, duck_cols, 12)
                if a12 != b12:
                    problems.append("WARN-ONLY: differs at 1e-12 precision")
        if problems and not problems[0].startswith("WARN"):
            print(f"FAIL  {name:28s} {'; '.join(problems)}")
            n_fail += 1
            results[name] = {"status": "fail", "rows": len(spark_rows),
                             "sec": round(time.time() - t0, 2),
                             "problems": problems}
        else:
            note = "  [fp-risk]" if problems else ""
            print(f"pass  {name:28s} {len(spark_rows)} rows "
                  f"({time.time()-t0:.1f}s){note}")
            n_pass += 1
            results[name] = {"status": "pass", "rows": len(spark_rows),
                             "sec": round(time.time() - t0, 2),
                             "problems": problems}
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump({"sf_dir": sf_dir, "vanilla": vanilla,
                        "n_pass": n_pass, "n_fail": n_fail,
                        "n_rows_only": n_rowsonly,
                        "queries": results}, f, indent=1,
                       default=str)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
