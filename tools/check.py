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
import os
import sys
import tempfile

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Driver-readable incremental record (judge r17 "next round" #1): the
# driver's correctness capture has come back empty four rounds running,
# so this gate writes its per-query verdicts to a fixed committed path
# AS IT GOES (after every query, not at exit — a timeout still leaves a
# partial record) in the driver's own per-query shape:
#   {query: {rows_match, schema_match, hash_match, err}}
# rows_match  = row counts equal
# schema_match = column names AND pandas dtypes equal (the driver hash
#                is dtype-sensitive)
# hash_match  = every cell exactly equal (the full-content check)
# err         = first failure description, or null on pass
LAST_CORRECTNESS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "verify", "last_correctness.json")


def write_incremental(record):
    try:
        d = os.path.dirname(LAST_CORRECTNESS)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(record, f, indent=0, sort_keys=True)
        os.replace(tmp, LAST_CORRECTNESS)
    except OSError:
        pass  # read-only checkout must not kill the gate itself


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


def check_one(con, out_dir, name, sql):
    """Returns (rows_match, schema_match, hash_match, err, msg)."""
    try:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        m = f"spark output unreadable: {e}"
        return False, False, False, m, m
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        m = f"oracle error: {e}"
        return False, False, False, m, m
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        m = (f"columns spark={list(got.columns)} "
             f"oracle={list(exp.columns)}")
        return len(got) == len(exp), False, False, m, m
    rows_match = len(got) == len(exp)
    dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype))
              for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
    if dt_bad:
        m = ("dtype mismatch (driver hash is dtype-sensitive): "
             + "; ".join(f"{c}: spark={a} oracle={b}"
                         for c, a, b in dt_bad))
        return rows_match, False, False, m, m
    if not rows_match:
        m = f"rows spark={len(got)} oracle={len(exp)}"
        return False, True, False, m, m
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
        m = (f"{len(bad)}+ cell diffs, e.g. "
             + "; ".join(f"row{i} {c}: spark={a!r} oracle={b!r}"
                         for i, c, a, b in bad[:4]))
        return True, True, False, m, m
    if approx:
        m = (f"exact-match fails on {approx} float cells "
             f"(within 1e-9) — driver hash may reject")
        return True, True, False, m, m
    return True, True, True, None, \
        f"{len(got)} rows x {len(got.columns)} cols"


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # order_id = user_id*1000 + cumulative-deletes (engine AND oracle):
    # >= 1000 deletes for any one user collides order_ids across users
    # and the two sides diverge silently. The bound is load-bearing —
    # assert it loudly at every SF the gate sees (judge r17 #5).
    max_del = con.execute(
        "SELECT coalesce(max(n), 0) FROM (SELECT user_id, count(*) n "
        "FROM events WHERE event_type='error' GROUP BY user_id)"
    ).fetchone()[0]
    if max_del >= 1000:
        print(f"FAIL order_id-bound: a user has {max_del} delete events "
              "(>= 1000) — user_id*1000+deletes collides across users; "
              "widen the multiplier in Level3Source AND every mkt_* "
              "oracle in lockstep")
        return 1
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    record = {}
    write_incremental(record)  # empty-but-present beats absent on crash
    for name, sql in sorted(oracle.items()):
        rows_ok, schema_ok, hash_ok, err, msg = \
            check_one(con, out_dir, name, sql)
        record[name] = {"rows_match": bool(rows_ok),
                        "schema_match": bool(schema_ok),
                        "hash_match": bool(hash_ok),
                        "err": err}
        write_incremental(record)
        if hash_ok:
            print(f"PASS {name}: {msg}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
