#!/usr/bin/env python3
"""Local correctness self-check (mimics the driver's DuckDB-oracle gate).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads <out>/oracle_sql.json, registers the sf parquet tables as DuckDB
views, runs each oracle, loads the Spark result parquet, sorts columns by
name and rows by all values, and compares cell-by-cell.

The comparison is TYPED, the way the driver's hasher is: the oracle side
comes out of DuckDB as native Python objects (int/float/str/Decimal/
date/datetime/bool) and the Spark side is read with pyarrow (NOT through
DuckDB, which would normalize representations and hide drift). A cell
matches only if both sides carry the same type *kind* and the same value
-- a Decimal on one side vs a float on the other, or a date vs a
datetime, is a FAIL even when str() would render them alike. This is what
bit round 8 (q103/q104: identical values, hash-red): the old str()-pair
compare passed where the driver's typed hash did not.
"""
import json, math, sys, glob, os
import datetime, decimal
import duckdb
import pyarrow.parquet as pq


def kind(x):
    """Collapse each value into the type family the driver's hash keys on.

    bool before int (bool is an int subclass); datetime before date
    (datetime is a date subclass)."""
    if x is None: return "null"
    if isinstance(x, bool): return "bool"
    if isinstance(x, int): return "int"
    if isinstance(x, float): return "float"
    if isinstance(x, decimal.Decimal): return "decimal"
    if isinstance(x, datetime.datetime): return "timestamp"
    if isinstance(x, datetime.date): return "date"
    if isinstance(x, (bytes, bytearray)): return "binary"
    if isinstance(x, str): return "str"
    if isinstance(x, (list, tuple)): return "array"
    if isinstance(x, dict): return "map"
    return type(x).__name__


def cells_equal(a, b):
    ka, kb = kind(a), kind(b)
    if ka == "null" and kb == "null": return True
    if ka != kb: return False
    if ka == "float":
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    if ka == "timestamp":
        # strip tz-awareness mismatches only when instants agree
        aa = a.replace(tzinfo=None) if a.tzinfo else a
        bb = b.replace(tzinfo=None) if b.tzinfo else b
        return aa == bb
    if ka == "array":
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def sortkey(row):
    return tuple((kind(x), str(x)) for x in row)


def oracle_rows(con, sql):
    """DuckDB result as native Python cells, columns sorted by name."""
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    rows = [tuple(r[i] for i in order) for r in cur.fetchall()]
    return [c.lower() for c in sorted(cols, key=str.lower)], rows


def spark_rows(out_dir, name):
    """Spark parquet output as native Python cells via pyarrow (no DuckDB
    normalization), columns sorted by name."""
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    tables = [pq.read_table(f) for f in files]
    cols = sorted(tables[0].column_names, key=str.lower)
    rows = []
    for t in tables:
        t = t.select(cols)
        rows.extend(tuple(r[c] for c in cols) for r in t.to_pylist())
    return [c.lower() for c in cols], rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
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
            wcols, want = oracle_rows(con, sql)
            gcols, got = spark_rows(out_dir, name)
            want.sort(key=sortkey); got.sort(key=sortkey)
            ok = len(want) == len(got) and wcols == gcols
            detail = f"rows {len(got)}/{len(want)}"
            if ok:
                bad = 0
                for rw, rg in zip(want, got):
                    if len(rw) != len(rg) or not all(cells_equal(x, y) for x, y in zip(rw, rg)):
                        bad += 1
                        if bad <= 2:
                            tw = tuple(kind(x) for x in rw)
                            tg = tuple(kind(x) for x in rg)
                            detail += f"\n    want {rw} {tw}\n    got  {rg} {tg}"
                ok = bad == 0
                if bad: detail += f" ({bad} mismatched rows)"
            else:
                detail += f" cols want={wcols} got={gcols}"
            print(("PASS " if ok else "FAIL ") + name + ("" if ok else "  " + detail))
            n_pass += ok; n_fail += (not ok)
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail" + (f", {n_skip} skipped (not in this Verify run)" if n_skip else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
