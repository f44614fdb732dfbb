#!/usr/bin/env python3
"""Local dev replica of the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
  <outDir> = directory written by `graft.Verify` (one parquet dir per
  query + oracle_sql.json); <sfDir> = testdata dir for the oracle side.

Registers each testdata parquet as a DuckDB view, runs every oracle SQL,
and compares against the Spark result: columns sorted by name, rows
sorted by all columns, exact cell equality (floats compared exactly
first, then with 1e-9 rel tolerance reported separately).

Dtype-strict: both sides reach pandas through the same DuckDB
conversion, so any pandas-dtype difference is a genuine type
difference in the underlying data (e.g. an uncast DuckDB HUGEINT
rendering as float64 against Spark's int64, or an int32/int64 width
skew). The driver's hash is dtype-sensitive; loose `==` cell compare
(2387.0 == 2387) cannot see this class, so dtype mismatch is a FAIL
here even when every cell compares equal.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} "
                  f"oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns
                  if str(got[c].dtype) != str(exp[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch (driver hash is "
                  "dtype-sensitive): "
                  + "; ".join(f"{c}: spark={a} oracle={b}"
                              for c, a, b in dt_bad))
            n_fail += 1
            continue
        bad = []
        approx = 0
        gv, ev = got.values.tolist(), exp.values.tolist()
        for i in range(len(gv)):
            for j, c in enumerate(got.columns):
                a, b = gv[i][j], ev[i][j]
                fa = isinstance(a, float)
                fb = isinstance(b, float)
                if fa and math.isnan(a):
                    a = None
                if fb and math.isnan(b):
                    b = None
                if not cells_equal(a, b):
                    if (fa and fb and a is not None and b is not None and
                            abs(a - b) <= 1e-9 * max(abs(a), abs(b))):
                        approx += 1
                    else:
                        bad.append((i, c, a, b))
                        if len(bad) > 4:
                            break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, e.g. "
                  + "; ".join(f"row{i} {c}: spark={a!r} oracle={b!r}"
                              for i, c, a, b in bad[:4]))
            n_fail += 1
        elif approx:
            print(f"WARN {name}: exact-match fails on {approx} float cells "
                  f"(within 1e-9) — driver hash may reject")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows x {len(got.columns)} cols")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
