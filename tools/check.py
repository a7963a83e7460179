#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir]
Reads the Verify dump (<out>/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same tables, and compares row counts,
column names, and sorted values.
"""
import sys, json, glob, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp_rel = con.sql(sql)
        expcols = list(exp_rel.columns)
        exptypes = [str(t) for t in exp_rel.types]
        exp = exp_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        got_rel = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        gotcols = list(got_rel.columns)
        gottypes = [str(t) for t in got_rel.types]
        got = got_rel.fetchall()
    except Exception as e:
        # surface the Spark-side error Verify recorded, if there is one —
        # an erroring query must be red WITH its reason, never just absent
        try:
            spark_err = json.load(open(f"{OUT}/errors.json")).get(name)
        except Exception:
            spark_err = None
        if spark_err:
            print(f"FAIL {name}: spark query errored: {spark_err[:200]}")
        else:
            print(f"FAIL {name}: spark result missing: {e}")
        fails += 1
        continue
    if sorted(expcols) != sorted(gotcols):
        print(f"FAIL {name}: cols exp={expcols} got={gotcols}")
        fails += 1
        continue
    # the driver's hasher is type-sensitive: HUGEINT vs BIGINT is a FAIL
    # even when values match, so compare DuckDB logical types by column.
    etyp = {c: t for c, t in zip(expcols, exptypes)}
    gtyp = {c: t for c, t in zip(gotcols, gottypes)}
    if etyp != gtyp:
        diff = {c: (etyp[c], gtyp[c]) for c in etyp if etyp[c] != gtyp[c]}
        print(f"FAIL {name}: types differ (oracle, spark): {diff}")
        fails += 1
        continue
    # align column order by name, then sort rows
    eidx = [expcols.index(c) for c in sorted(expcols)]
    gidx = [gotcols.index(c) for c in sorted(gotcols)]
    def norm(rows, idx):
        out = []
        for r in rows:
            out.append(tuple(repr(r[i]) for i in idx))
        return sorted(out)
    e_n, g_n = norm(exp, eidx), norm(got, gidx)
    if len(e_n) != len(g_n):
        print(f"FAIL {name}: rows exp={len(e_n)} got={len(g_n)}")
        fails += 1
    elif e_n != g_n:
        bad = sum(1 for a, b in zip(e_n, g_n) if a != b)
        print(f"FAIL {name}: {bad}/{len(e_n)} rows differ")
        for a, b in zip(e_n, g_n):
            if a != b:
                print(f"   exp {a}\n   got {b}")
                break
        fails += 1
    else:
        print(f"ok   {name}: {len(e_n)} rows")
print("RESULT:", "FAIL" if fails else "PASS", f"({len(oracle)-fails}/{len(oracle)})")
sys.exit(1 if fails else 0)
