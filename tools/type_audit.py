#!/usr/bin/env python3
"""Audit every oracle in oracle_sql.json for DuckDB type widenings.

DuckDB silently widens some expressions past Spark's types (window `sum`
over BIGINT -> HUGEINT, `//` propagates HUGEINT, integer `avg` -> DOUBLE is
fine on both sides) and the driver's result hasher is type-sensitive, so an
uncast oracle can hash-mismatch a value-identical Spark result. This script
runs every oracle with LIMIT 0 (types only, no data) and diffs the DuckDB
result types against the Spark parquet output schema from a prior
graft.Verify run.

Usage: python3 tools/type_audit.py [--sf /root/testdata/sf0.01]
                                   [--out /tmp/graft_verify]
"""
import argparse, json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/graft_verify")
    args = ap.parse_args()

    with open(f"{args.out}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    bad = 0
    for name in sorted(oracles):
        d = os.path.join(args.out, name)
        if not os.path.isdir(d):
            print(f"  [skip] {name}: no Spark output dir")
            continue
        sp = con.execute(f"SELECT * FROM '{d}/*.parquet' LIMIT 0")
        ts = {c[0]: str(c[1]) for c in sp.description}
        try:
            dk = con.execute(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            bad += 1
            continue
        td = {c[0]: str(c[1]) for c in dk.description}
        if sorted(ts) != sorted(td):
            print(f"✗ {name}: col names differ: spark={sorted(ts)} "
                  f"duck={sorted(td)}")
            bad += 1
            continue
        diffs = [(c, ts[c], td[c]) for c in sorted(ts) if ts[c] != td[c]]
        if diffs:
            for c, a, b in diffs:
                print(f"✗ {name}: col {c}: spark={a} duck={b}")
            bad += 1
        else:
            print(f"✓ {name}")
    print(f"\n{len(oracles)} oracles, {bad} with type/name mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
