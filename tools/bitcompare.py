#!/usr/bin/env python3
"""Strict BIT-level compare of Spark results vs the DuckDB oracle.

Usage: python3 tools/bitcompare.py <sfDir> <verifyOutDir> [query ...]

Same canonicalization as compare.py (columns sorted by name, rows by all
columns) but every float is compared as its IEEE-754 bytes
(struct.pack('<d', v)) — zero tolerance. This is the gate the driver's
exact-hash compare actually applies; compare.py's 1e-12 slack exists only
to separate drift from representation noise while iterating. Run it on
queries whose doubles come from a multi-op IEEE tail (the calendar-zone
gates, TWA panels) before declaring them done.

With no query names, runs every query present in oracle_sql.json.
Exit 1 on any mismatch.
"""
import glob
import json
import struct
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


def bits(v):
    if isinstance(v, float):
        return struct.pack("<d", v)
    return v


ok = fail = 0
names = sorted(x.split("/")[-1] for x in glob.glob(f"{outdir}/*")
               if not x.endswith(".json"))
for name in names:
    if only and name not in only:
        continue
    if name not in oracle:
        continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    scols = [d[0] for d in sdf.description]
    srows = sdf.fetchall()
    odf = con.execute(oracle[name])
    ocols = [d[0] for d in odf.description]
    orows = odf.fetchall()
    sc, sr = canon(srows, scols)
    oc, orr = canon(orows, ocols)
    if sc != oc or len(sr) != len(orr):
        print(f"FAIL {name}: shape mismatch cols {sc} vs {oc}, "
              f"rows {len(sr)} vs {len(orr)}")
        fail += 1
        continue
    bad = None
    for i, (a, b) in enumerate(zip(sr, orr)):
        pa = tuple(bits(x) for x in a)
        pb = tuple(bits(x) for x in b)
        if pa != pb:
            bad = (i, a, b)
            break
    if bad:
        print(f"FAIL {name}: first bit-diff at row {bad[0]}: "
              f"spark={bad[1]} oracle={bad[2]}")
        fail += 1
    else:
        print(f"BIT-OK {name}: {len(sr)} rows, every double "
              "byte-identical")
        ok += 1
print(f"\n{ok} bit-ok, {fail} fail")
sys.exit(1 if fail else 0)
