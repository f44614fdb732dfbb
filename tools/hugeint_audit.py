#!/usr/bin/env python3
"""Audit every oracle SQL mirror for DuckDB HUGEINT in its final projection.

DuckDB widens SUM(BIGINT) to HUGEINT (int128); the driver's correctness gate
hashes values *with* their arrow type, so an uncast integer sum that reaches a
final projection hash-mismatches Spark's int64 even when the values are
identical (this is exactly what broke `pipe_pack_stats` in round 10). This
script is the authoritative sweep for that class: it runs `DESCRIBE` over each
query in an `oracle_sql.json` dump (produced by `graft.Verify`) against the
sf0.001 parquet tables and flags any HUGEINT output column.

Usage:  python3 tools/hugeint_audit.py [oracle_sql.json] [sf_dir]
Run after any Oracles.scala edit; expected output is "0 flagged".
(Dev-side tool only — uses the driver's duckdb, not a library dependency.)
"""
import duckdb, json, glob, os, sys

json_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_close/oracle_sql.json"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

sql = json.load(open(json_path))
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

bad, errs = {}, {}
for name, q in sorted(sql.items()):
    try:
        rows = con.execute(f"DESCRIBE SELECT * FROM ({q})").fetchall()
        huge = [(r[0], r[1]) for r in rows if "HUGEINT" in r[1].upper()]
        if huge:
            bad[name] = huge
    except Exception as e:
        errs[name] = str(e)[:150]

for k, v in bad.items():
    print("FLAG", k, v)
print(f"{len(bad)} flagged / {len(sql)}; {len(errs)} errors")
for k, v in errs.items():
    print("ERR", k, v)
sys.exit(1 if bad or errs else 0)
