#!/usr/bin/env python3
"""Adversarial-fixture oracle sweep (r9 verdict #6).

Usage: python3 tools/check_adversarial.py <advRoot> <verifyAdvDir> <verifyEmptyDir> [out.json]

<advRoot> is the AdversarialData output root (containing adv/ and
adv_empty/); the two verify dirs are graft.Verify dumps run against
those fixtures. Compares every query against its DuckDB oracle on the
same degenerate tables and writes one JSON artifact with a row per
(query, fixture).

Unlike check_oracle.py, rows are SORTED by all columns before the cell
compare: the adversarial fixtures are built from ties (identical
timestamps, duplicated text, equal values), so ORDER BY tie-breaking
legitimately differs between engines — the driver's checker sorts too.
Verify errors recorded in _verify_errors.json surface as "error" rows.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def sort_rows(cols):
    if not cols:
        return cols
    n = len(next(iter(cols.values())))
    def key(i):
        out = []
        for c in sorted(cols):
            v = cols[c][i]
            out.append((v is None, "nan" if isinstance(v, float) and math.isnan(v)
                        else str(v)))
        return out
    order = sorted(range(n), key=key)
    return {c: [vs[i] for i in order] for c, vs in cols.items()}


def eq(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    try:
        return a == b
    except Exception:
        return str(a) == str(b)


def kind(t):
    s = str(t)
    if s.startswith("decimal") or s == "int128":
        return "decimal"
    if s.startswith(("int", "uint")):
        return "int"
    return s


def compare(exp, got):
    errs = []
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        return [f"columns differ: oracle={ecols} spark={gcols}"]
    for c in ecols:
        if kind(exp.schema.field(c).type) != kind(got.schema.field(c).type):
            errs.append(f"col {c}: dtype kind differs "
                        f"oracle={exp.schema.field(c).type} "
                        f"spark={got.schema.field(c).type}")
    if exp.num_rows != got.num_rows:
        errs.append(f"rows differ: oracle={exp.num_rows} spark={got.num_rows}")
    if errs:
        return errs
    e = sort_rows({c: exp.column(c).to_pylist() for c in ecols})
    g = sort_rows({c: got.column(c).to_pylist() for c in ecols})
    for c in ecols:
        for i in range(exp.num_rows):
            if not eq(e[c][i], g[c][i]):
                errs.append(f"col {c}: first diff at sorted row {i}: "
                            f"oracle={e[c][i]!r} spark={g[c][i]!r}")
                break
    return errs


def sweep(con_dir, out_dir, tag, results):
    con = duckdb.connect()
    for t in TABLES:
        # AdversarialData writes Spark-style parquet DIRECTORIES
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{con_dir}/{t}.parquet/*.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        verrs = json.load(open(f"{out_dir}/_verify_errors.json"))
    except Exception:
        verrs = {}
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        row = {"fixture": tag}
        if name in verrs:
            row["status"] = "error"
            row["err"] = f"spark: {verrs[name][:300]}"
            fail += 1
        else:
            try:
                exp = con.execute(sql).fetch_arrow_table()
                got = con.execute(
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
                ).fetch_arrow_table()
                errs = compare(exp, got)
                if errs:
                    row["status"] = "fail"
                    row["err"] = "; ".join(errs[:3])
                    fail += 1
                else:
                    row["status"] = "ok"
                    row["rows"] = got.num_rows
                    ok += 1
            except Exception as e:
                row["status"] = "error"
                row["err"] = str(e)[:300]
                fail += 1
        results.setdefault(name, {})[tag] = row
        if row["status"] != "ok":
            print(f"{row['status'].upper():5s} {tag:9s} {name}: "
                  f"{row.get('err', '')[:200]}")
    print(f"[{tag}] {ok} ok, {fail} not ok")
    return fail


def main(adv_root, v_adv, v_empty, out_json="CORRECTNESS_adversarial.json"):
    results = {}
    f1 = sweep(f"{adv_root}/adv", v_adv, "adv", results)
    f2 = sweep(f"{adv_root}/adv_empty", v_empty, "empty", results)
    summary = {
        "note": "full oracle sweep over degenerate fixtures "
                "(graft.AdversarialData): adv = tiny/tied/null-laden "
                "tables, empty = all tables zero rows; rows sorted "
                "before compare (ties order differently across engines)",
        "n_queries": len(results),
        "adv_not_ok": f1,
        "empty_not_ok": f2,
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {out_json}: {len(results)} queries, "
          f"adv {f1} not-ok, empty {f2} not-ok")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
