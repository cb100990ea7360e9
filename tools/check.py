#!/usr/bin/env python3
"""Local correctness self-check (mimics the driver's DuckDB-oracle gate).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads <out>/oracle_sql.json, registers the sf parquet tables as DuckDB
views, runs each oracle, loads the Spark result parquet, sorts columns by
name and rows by all values, and compares cell-by-cell.
"""
import json, math, sys
import duckdb

def canon(df):
    # sort columns by name, then rows; floats compared bitwise after round-trip
    df = df[sorted(df.columns)]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows

def cells_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    import os
    # Verify writes manifest.json (the attempted-query list) before running
    # anything. A manifest query with no output dir means the query crashed
    # (or killed the JVM) -> that is a FAILURE, not a skip. Only queries
    # absent from the manifest (SPARK_GRAFT_VERIFY_ONLY partial runs) are
    # skipped quietly. Fallback for pre-manifest output dirs: old skip rule.
    manifest_path = f"{out_dir}/manifest.json"
    attempted = set(json.load(open(manifest_path))) if os.path.exists(manifest_path) else None
    for name, sql in sorted(oracles.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if attempted is not None and name in attempted:
                print(f"FAIL {name}  attempted (in manifest) but no output dir -- query crashed")
                n_fail += 1
            else:
                n_skip += 1
            continue
        try:
            want = con.execute(sql).df()
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            cw, cg = canon(want), canon(got)
            ok = len(cw) == len(cg) and sorted(want.columns.str.lower()) == sorted(got.columns.str.lower())
            detail = f"rows {len(cg)}/{len(cw)}"
            if ok:
                bad = 0
                for rw, rg in zip(cw, cg):
                    if len(rw) != len(rg) or not all(cells_equal(x, y) for x, y in zip(rw, rg)):
                        bad += 1
                        if bad <= 2:
                            detail += f"\n    want {rw}\n    got  {rg}"
                ok = bad == 0
                if bad: detail += f" ({bad} mismatched rows)"
            else:
                detail += f" cols want={sorted(want.columns)} got={sorted(got.columns)}"
            print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  " + detail))
            n_pass += ok; n_fail += (not ok)
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail" + (f", {n_skip} skipped (not in this Verify run)" if n_skip else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
