#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the parquet results dumped by `graft.Verify` (one dir per query)
plus the oracle_sql.json it writes, runs each oracle in DuckDB against
the same sf dir, and compares: row count, column names, and an
order-insensitive hash of stringified values (columns sorted by name,
rows sorted).

Usage: check_parity.py <sfDir> <verifyOutDir>
"""
import json, sys, os, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # sort columns by name, stringify, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        try:
            mine = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            my_cols = list(mine.columns)
            my_rows = mine.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: rows={len(my_rows)} (no oracle)")
            continue
        try:
            orc = con.sql(oracles[name])
            orc_cols = list(orc.columns)
            orc_rows = orc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(my_cols) != sorted(orc_cols):
            print(f"FAIL {name}: columns {sorted(my_cols)} != {sorted(orc_cols)}")
            n_fail += 1
            continue
        if len(my_rows) != len(orc_rows):
            print(f"FAIL {name}: rowcount {len(my_rows)} != {len(orc_rows)}")
            n_fail += 1
            continue
        a, b = canon(my_rows, my_cols), canon(orc_rows, orc_cols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name}: rows={len(my_rows)}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
