#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the parquet results dumped by `graft.Verify` (one dir per query)
plus the oracle_sql.json it writes, runs each oracle in DuckDB against
the same sf dir, and compares the two PANDAS frames (via `.df()`, the
same path the driver uses): row count, column names, and a hash of the
stringified frame with columns sorted by name and rows sorted.

Going through pandas is load-bearing: DuckDB returns SUM(int) as
HUGEINT, which `.df()` converts to float64 — so `2` (Spark bigint) vs
`2.0` (oracle) hash-differently, exactly as the driver sees it. The
previous repr(fetchall()) comparison hid that drift (HUGEINT comes
back as a Python int there) and passed queries the driver failed.
Likewise pandas `sort_values` raises on array-valued (ndarray) cells —
the driver reports those as ERR, and so do we.

ASYMMETRY IS THE POINT (round-8 lesson): the driver reads the SPARK
result parquet directly with pyarrow — DECIMAL(18,6) survives as
decimal.Decimal objects stringifying "x.640000" — while the ORACLE
side goes through DuckDB `.df()`, which coerces DECIMAL to float64
"x.64". Round 8 read BOTH sides through `.df()`, so both coerced and
three driver hash-fails (q202/q205/q214) sailed through locally. The
Spark side must therefore come from pyarrow.read_table().to_pandas()
with decimals preserved, and only the oracle via `.df()`.

Usage: check_parity.py <sfDir> <verifyOutDir>
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_hash(df):
    """Columns sorted by name, rows sorted, values stringified, md5."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    h = hashlib.md5()
    for row in df.astype(str).itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


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
            # pyarrow, NOT duckdb .df(): preserves decimal dtypes the
            # way the driver sees them (see module docstring).
            parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not parts:
                raise FileNotFoundError(f"no parquet under {out_dir}/{name}")
            import pandas as pd
            mine = pd.concat(
                [pq.read_table(p).to_pandas() for p in parts],
                ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: rows={len(mine)} (no oracle)")
            continue
        try:
            orc = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(mine.columns) != sorted(orc.columns):
            print(f"FAIL {name}: columns {sorted(mine.columns)} != "
                  f"{sorted(orc.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(orc):
            print(f"FAIL {name}: rowcount {len(mine)} != {len(orc)}")
            n_fail += 1
            continue
        try:
            ha, hb = canon_hash(mine), canon_hash(orc)
        except Exception as e:
            print(f"ERR {name}: hash failed (driver would report err): {e}")
            n_fail += 1
            continue
        if ha != hb:
            a = mine[sorted(mine.columns)].astype(str)
            a = a.sort_values(by=list(a.columns)).head(3)
            b = orc[sorted(orc.columns)].astype(str)
            b = b.sort_values(by=list(b.columns)).head(3)
            print(f"FAIL {name}: hash mismatch\n  spark dtypes: "
                  f"{dict(mine.dtypes.astype(str))}\n  oracle dtypes: "
                  f"{dict(orc.dtypes.astype(str))}\n  spark head: "
                  f"{a.values.tolist()}\n  oracle head: {b.values.tolist()}")
            n_fail += 1
            continue
        print(f"PASS {name}: rows={len(mine)}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
