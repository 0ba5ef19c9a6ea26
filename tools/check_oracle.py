#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump written by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB against the sfDir
parquet tables, and compares row counts, sorted-by-name column sets, and
cell values. Comparison is EXACT (floats bitwise, NaN==NaN): queries are
written so both engines produce identical doubles — there is
deliberately no tolerance fallback, and the first differing cell is
printed so the magnitude of a mismatch is visible.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fail += 1
            continue
        errs = compare(exp, got)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:4]))
            fail += 1
        else:
            ok += 1
            print(f"ok   {name} ({got.num_rows} rows)")
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

def compare(exp, got):
    errs = []
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        return [f"columns differ: oracle={ecols} spark={gcols}"]
    # dtype check: the driver's value hash tolerates integer WIDTH
    # differences (int32 row_number vs DuckDB's int64 passed round 1) but
    # not KIND differences — DuckDB SUM(int) -> hugeint/decimal128 vs
    # Spark's int64 was the round-1 hash-mismatch class. Normalize widths,
    # flag kind divergence (int vs decimal vs float vs string ...).
    def kind(t):
        s = str(t)
        # int128 (hugeint) must be checked BEFORE the int-width prefix
        # match — it is exactly the kind divergence this check exists for
        if s.startswith("decimal") or s == "int128":
            return "decimal"
        if s.startswith(("int", "uint")):
            return "int"
        return s
    for c in ecols:
        et = exp.schema.field(c).type
        gt = got.schema.field(c).type
        if kind(et) != kind(gt):
            errs.append(f"col {c}: dtype kind differs oracle={et} spark={gt}")
    if exp.num_rows != got.num_rows:
        errs.append(f"rows differ: oracle={exp.num_rows} spark={got.num_rows}")
    n = min(exp.num_rows, got.num_rows)
    for c in ecols:
        e, g = exp.column(c).to_pylist(), got.column(c).to_pylist()
        bad = 0
        first = None
        for i in range(n):
            a, b = e[i], g[i]
            if a is None and b is None:
                continue
            if a is None or b is None or not eq(a, b):
                bad += 1
                if first is None:
                    first = (i, a, b)
        if bad:
            errs.append(f"col {c}: {bad}/{n} cells differ, first at "
                        f"row {first[0]}: oracle={first[1]!r} spark={first[2]!r}")
    return errs

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        if math.isnan(a) and math.isnan(b):
            return True
        return False
    try:
        return a == b
    except Exception:
        return str(a) == str(b)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
