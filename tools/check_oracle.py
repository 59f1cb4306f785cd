#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: schema (column names), row count, and
values (columns sorted by name, rows sorted, NaN-safe, float-tolerant
at 1e-9 relative to catch ULP-level engine noise that rounding should
already have removed).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return float(v) if False else v
    return v


EXACT = "--exact" in sys.argv  # driver-parity mode: the real gate
# HASHES values, so floats must be BIT-identical; run this before
# trusting a new float-emitting oracle (the r3 q89 lesson: 1e-9
# tolerance here hid a cross-engine libm rounding flip)


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, str) or isinstance(b, str):
            return str(a) == str(b)
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        if EXACT:
            return fa == fb
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            # partial Verify runs (name-prefix filtered) leave most
            # outputs absent — skip silently when asked
            if os.environ.get("SKIP_MISSING"):
                continue
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_df.columns)
        o_cols = sorted(oracle_df.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: schema {s_cols} != {o_cols}")
            n_fail += 1
            continue
        if len(spark_df) != len(oracle_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(oracle_df)}")
            n_fail += 1
            continue
        s_rows = sorted(
            [tuple(canon(v) for v in r) for r in
             spark_df[s_cols].itertuples(index=False, name=None)],
            key=lambda r: tuple(str(x) for x in r))
        o_rows = sorted(
            [tuple(canon(v) for v in r) for r in
             oracle_df[o_cols].itertuples(index=False, name=None)],
            key=lambda r: tuple(str(x) for x in r))
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            if not all(close(a, b) for a, b in zip(sr, orow)):
                bad = (i, sr, orow)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark:  {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    # rows-only queries: just check output exists and has rows
    import glob
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(p.rstrip("/"))
        if name in oracles:
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{p}*.parquet'").fetchone()[0]
            status = "PASS" if n > 0 else "WARN(empty)"
            print(f"{status} {name} rows-only ({n} rows)")
            if n == 0:
                n_fail += 1
            else:
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: rows-only unreadable: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
