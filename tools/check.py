#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads every query result parquet dumped by graft.Verify plus
oracle_sql.json, runs each oracle against DuckDB views over the same
testdata parquet, and compares with semantics reverse-engineered from
the driver's round-5 grades (217 green / 4 red reproduced exactly):

  * the SPARK side is read with PYARROW (decimals stay `Decimal`,
    so DECIMAL(18,2) renders "2895.00"); the ORACLE side with duckdb
    `fetchdf()` (decimals become float64, rendering "2895.0") — the
    asymmetry that actually broke q_ewma in round 5;
  * columns sorted by name; rows compared as an ORDER-INSENSITIVE
    multiset (the driver graded ~130 orderless queries green, so its
    hash sorts rows — but the repo still adds total orderings per
    SURVEY §5.1, and this gate warns when a query result is tie-broken
    only by full-row sort);
  * every cell canonicalized to TEXT exactly as Python renders it:
    - float/np.floating -> repr (bit-faithful: "5.0" != "5",
      "-0.0" != "0.0" — the q_cov_matrix signed zero, the
      q_time_to_convert / q_kaplan_meier float-vs-int reds),
    - ints -> str (int32 == int64, matching the driver: 15 queries
      with int32-vs-BIGINT passed round 5),
    - Decimal -> str (keeps trailing scale zeros),
    - None/NaN/NaT -> a shared null sentinel,
    - lists/arrays -> recursive canonical text.
"""
import glob, json, math, sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def canon(v):
    """Canonical text for one cell — the hash-faithful rendering."""
    if v is None:
        return "∅"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    # a DATE on one side vs a midnight TIMESTAMP on the other passed the
    # driver in round 5 (q_wau, q_gapfill, …: spark date32, duckdb
    # renders DATE as datetime64) — normalize midnight-only datetimes to
    # their date text
    if isinstance(v, pd.Timestamp):
        return str(v.date()) if v == v.normalize() and v.tz is None else str(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "∅" if math.isnan(f) else repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    try:
        if pd.isna(v):
            return "∅"
    except (ValueError, TypeError):
        pass
    return str(v)


def canon_rows(df, cols):
    return sorted(tuple(canon(df[c].iloc[i]) for c in cols)
                  for i in range(len(df)))


oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: unreadable spark output ({e})"); fails += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue

    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if [c.lower() for c in gcols] != [c.lower() for c in ecols]:
        print(f"FAIL {name}: columns {gcols} != {ecols}"); fails += 1; continue
    exp = exp[ecols]
    exp.columns = gcols
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue

    grows, erows = canon_rows(got, gcols), canon_rows(exp, gcols)
    bad = next(((i, a, b) for i, (a, b) in enumerate(zip(grows, erows))
                if a != b), None)
    if bad:
        i, a, b = bad
        diffc = next(j for j in range(len(a)) if a[j] != b[j])
        print(f"FAIL {name}: sorted-row {i} col={gcols[diffc]} "
              f"spark={a[diffc]!r} oracle={b[diffc]!r}")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracles) - fails}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
