#!/usr/bin/env python3
"""Degenerate-corpus divergence sweep (r11 VERDICT item 2).

Like parity.py, but with divergence semantics suited to adversarial
micro-corpora: the assertion is that BOTH engines do the same thing —
same values (NaN agrees with NaN, Inf with Inf), same emptiness, or
same refusal. A query where Spark errors AND the DuckDB oracle errors
is AGREE_ERROR (recorded, not failed); a query where exactly one side
errors, or values/NaN-ness differ, is a DIVERGENCE.

Usage: degen_sweep.py <corpusDir> <verifyOutDir> [queryName ...]

The Spark side must have been dumped first:
  runMain graft.Verify <corpusDir> <verifyOutDir>
(graft.Verify writes a _verify_error marker parquet when a query
throws, which this script reads as "Spark errored".)

Exit 0 = no divergence; 1 otherwise. Prints a summary line per class.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def kind(v):
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return type(v).__name__


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if kind(a) != kind(b):
        return False
    if isinstance(a, float):
        if math.isnan(a) and math.isnan(b):
            return True  # agreement, including on NaN
        return a == b
    return a == b


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # Spark-written tables are DIRECTORIES of part files; the
        # driver's testdata tables are single files — handle both
        import os
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{path}')")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    classes = {"AGREE": [], "AGREE_EMPTY": [], "AGREE_ERROR": [],
               "DIVERGE": []}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            classes["DIVERGE"].append((name, "no spark output at all"))
            continue
        s = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        spark_err = scols == ["_verify_error"]
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
            oracle_err = None
        except Exception as e:
            ocols, orows = [], []
            oracle_err = f"{type(e).__name__}: {e}"
        if spark_err and oracle_err:
            classes["AGREE_ERROR"].append((name, srows[0][0][:80] if srows
                                           else "?", oracle_err[:80]))
            continue
        if spark_err != (oracle_err is not None):
            which = ("spark errored, oracle returned "
                     f"{len(orows)} rows") if spark_err else \
                    f"oracle errored ({oracle_err}), spark returned " \
                    f"{len(srows)} rows"
            classes["DIVERGE"].append((name, which))
            continue
        if sorted(scols) != sorted(ocols):
            classes["DIVERGE"].append(
                (name, f"cols spark={sorted(scols)} oracle={sorted(ocols)}"))
            continue
        sperm = [scols.index(c) for c in sorted(scols)]
        operm = [ocols.index(c) for c in sorted(ocols)]
        srows = [tuple(r[i] for i in sperm) for r in srows]
        orows = [tuple(r[i] for i in operm) for r in orows]
        if len(srows) != len(orows):
            classes["DIVERGE"].append(
                (name, f"rowcount spark={len(srows)} oracle={len(orows)}"))
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if not eq(a, b):
                bad = (i, a, b)
                break
        if bad:
            classes["DIVERGE"].append(
                (name, f"row {bad[0]}: spark={bad[1]} oracle={bad[2]}"))
        elif not srows:
            classes["AGREE_EMPTY"].append((name,))
        else:
            classes["AGREE"].append((name,))
    for name, *detail in classes["DIVERGE"]:
        print(f"DIVERGE {name}: {detail[0]}")
    for name, *detail in classes["AGREE_ERROR"]:
        print(f"agree-error {name}: spark[{detail[0]}] duckdb[{detail[1]}]")
    print(f"== agree={len(classes['AGREE'])} "
          f"agree_empty={len(classes['AGREE_EMPTY'])} "
          f"agree_error={len(classes['AGREE_ERROR'])} "
          f"DIVERGE={len(classes['DIVERGE'])} ==")
    sys.exit(1 if classes["DIVERGE"] else 0)


if __name__ == "__main__":
    main()
