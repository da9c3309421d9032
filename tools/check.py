#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads every query result parquet dumped by graft.Verify plus
oracle_sql.json, runs each oracle against DuckDB views over the same
testdata parquet, and compares order-insensitively (sort columns by
name, sort rows, compare values cell-by-cell with exact equality for
non-floats and tight ulp tolerance reporting for floats so we can see
HOW far off a mismatch is).
"""
import json, math, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    try:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue

    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if [c.lower() for c in gcols] != [c.lower() for c in ecols]:
        print(f"FAIL {name}: columns {gcols} != {ecols}"); fails += 1; continue
    got = got[gcols].sort_values(gcols, ignore_index=True)
    exp = exp[ecols]
    exp.columns = gcols
    exp = exp.sort_values(gcols, ignore_index=True)
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    bad = None
    for c in gcols:
        gv, ev = got[c], exp[c]
        for i in range(len(gv)):
            a, b = gv.iloc[i], ev.iloc[i]
            na, nb = (a is None or (isinstance(a, float) and math.isnan(a))), \
                     (b is None or (isinstance(b, float) and math.isnan(b)))
            try:
                import pandas as pd
                na, nb = bool(pd.isna(a)), bool(pd.isna(b))
            except (ValueError, TypeError):
                pass
            if na and nb:
                continue
            if na != nb:
                bad = (c, i, a, b); break
            if isinstance(a, float) or isinstance(b, float):
                if float(a) != float(b):
                    bad = (c, i, a, b, abs(float(a) - float(b))); break
            elif str(a) != str(b):
                bad = (c, i, a, b); break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: first diff col={bad[0]} row={bad[1]} "
              f"spark={bad[2]!r} oracle={bad[3]!r}"
              + (f" absdiff={bad[4]}" if len(bad) > 4 else ""))
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracles) - fails}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
