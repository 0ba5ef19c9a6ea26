#!/usr/bin/env python3
"""Reconfiguration-determinism sweep (r10 verdict #2).

Usage: python3 tools/check_reconfig.py <sfDir> <label1>=<verifyDir1>
           [<label2>=<verifyDir2> ...] [--out CORRECTNESS_reconfig.json]

The engine's central determinism claim — written-order folds, block
decompositions, no order-sensitive float sums — is only proven at one
configuration by the per-round oracle gate. This tool replays the SAME
DuckDB-oracle comparison (exact cells, floats bitwise, check_oracle's
compare) against graft.Verify dumps produced under DIFFERENT Spark
configurations (partition counts, thread counts, AQE on/off). Any key
whose values move under repartitioning is a latent nondeterminism bug
the single-config cross-engine check cannot see.

Writes one JSON artifact: per-config pass/fail counts, the exact config
strings, and a per-key row for anything that diverged anywhere.
"""
import json, sys
import duckdb

sys.path.insert(0, __import__("os").path.dirname(__file__))
from check_oracle import TABLES, compare  # same exact-cell comparator


def sweep(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            errs = compare(exp, got)
            results[name] = "ok" if not errs else "; ".join(errs[:3])
        except Exception as e:
            results[name] = f"error: {e}"
    return results


def main(argv):
    out_path = "CORRECTNESS_reconfig.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0]
    configs = [a.split("=", 1) for a in argv[1:]]
    per_config = {}
    divergent = {}
    for label, vdir in configs:
        res = sweep(sf_dir, vdir)
        bad = {k: v for k, v in res.items() if v != "ok"}
        per_config[label] = {
            "verify_dir": vdir,
            "keys": len(res),
            "ok": len(res) - len(bad),
            "not_ok": len(bad),
        }
        for k, v in bad.items():
            divergent.setdefault(k, {})[label] = v
        print(f"[{label}] {len(res) - len(bad)} ok, {len(bad)} not ok")
    artifact = {
        "note": ("full-inventory DuckDB-oracle replay under alternate Spark "
                 "configurations (r10 verdict #2): a key passing the exact-cell "
                 "compare under every config is hash-stable across "
                 "parallelism/partitioning/AQE; divergent lists any key that "
                 "failed anywhere"),
        "sf_dir": sf_dir,
        "configs": per_config,
        "divergent": divergent,
    }
    json.dump(artifact, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: {len(configs)} configs, "
          f"{len(divergent)} divergent keys")
    return 1 if divergent else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
