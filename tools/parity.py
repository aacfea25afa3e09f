#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: parity.py <sfDir> <verifyOutDir> [queryName ...]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same source tables, and
compares column names (sorted), row counts, and every value exactly (the
driver hash-compares, so approximate equality would hide failures).
"""
import sys, json, glob, math
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
        return False  # int vs float etc. would hash differently
    if isinstance(a, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    npass = nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        if not glob.glob(f"{out}/{name}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        try:
            s = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
            # Mirror the driver: it converts both sides to pandas, sorts by
            # every column, and hashes. Two extra failure modes exist there
            # that fetchall()-comparison hides (both bit us in round 1):
            #  1. unsortable complex cells (list/map/struct -> ndarray/dict)
            #  2. dtype drift (e.g. DuckDB HUGEINT -> object/float while
            #     Spark writes int64) -> identical values, different hash
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
            odf = con.execute(sql).df()
            complex_cols = [c for c in sdf.columns
                            if sdf[c].map(lambda v: isinstance(v, (list, dict, tuple))
                                          or type(v).__name__ == 'ndarray').any()]
            if complex_cols:
                print(f"FAIL {name}: driver-unsortable complex columns {complex_cols}")
                nfail += 1
                continue
            # Compare dtype KIND only (i/u are interchangeable; width never
            # changes the rendered value, but int-vs-float/object does).
            def dkind(df, c):
                k = df[c].dtype.kind
                return 'i' if k in ('i', 'u') else k
            sdt = {c: dkind(sdf, c) for c in sdf.columns}
            odt = {c: dkind(odf, c) for c in odf.columns}
            dtmis = {c: (str(sdf[c].dtype), str(odf[c].dtype)) for c in sdt
                     if c in odt and sdt[c] != odt[c]
                     and not (len(sdf) == 0 or len(odf) == 0)}
            if dtmis:
                print(f"FAIL {name}: pandas dtype mismatch {dtmis}")
                nfail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            nfail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            nfail += 1
            continue
        sperm = [scols.index(c) for c in sorted(scols)]
        operm = [ocols.index(c) for c in sorted(ocols)]
        srows = [tuple(r[i] for i in sperm) for r in srows]
        orows = [tuple(r[i] for i in operm) for r in orows]
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            nfail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if not eq(a, b):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]} (cols {sorted(scols)})")
            print(f"  spark  = {bad[1]}")
            print(f"  oracle = {bad[2]}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
