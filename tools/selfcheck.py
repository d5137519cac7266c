#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 tools/selfcheck.py <sfDir> <outDir>

For each query dumped by Verify, runs the oracle SQL from
oracle_sql.json in DuckDB (tables registered as views over the same
parquet), then compares: schema (column names sorted), row count, and
values (columns sorted by name, rows sorted, exact compare with a
float report if not exactly equal).
"""
import sys, json, glob, math

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, want)
        if ok:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"columns differ: spark={gc} oracle={wc}"
    if len(got) != len(want):
        return False, f"row count differs: spark={len(got)} oracle={len(want)}"
    g = got[gc].sort_values(by=gc, ignore_index=True)
    w = want[wc].sort_values(by=wc, ignore_index=True)
    for c in gc:
        gv, wv = list(g[c]), list(w[c])
        for i, (a, b) in enumerate(zip(gv, wv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    rel = abs(a - b) / max(abs(a), abs(b), 1e-300)
                    return False, (f"col {c} row {i}: {a!r} != {b!r} "
                                   f"(rel={rel:.2e})")
            elif str(a) != str(b):
                return False, f"col {c} row {i}: {a!r} != {b!r}"
    # dtype report (informational)
    dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in gc
          if str(g[c].dtype) != str(w[c].dtype)]
    if dt:
        return True, f"(dtype diff: {dt})"
    return True, ""


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
