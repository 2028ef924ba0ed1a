#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each oracle
SQL in DuckDB over the testdata parquet and compare (schema-name-sorted,
row-sorted, exact values) with the Verify parquet dumps.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and represent exactly
        return repr(v + 0.0)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: result read error: {e}")
            failed.append(name)
            continue
        e_cols = sorted(exp.column_names)
        g_cols = sorted(got.column_names)
        if e_cols != g_cols:
            print(f"FAIL {name}: columns {g_cols} != {e_cols}")
            failed.append(name)
            continue
        e_rows = sorted(tuple(norm(r[c]) for c in e_cols) for r in exp.to_pylist())
        g_rows = sorted(tuple(norm(r[c]) for c in e_cols) for r in got.to_pylist())
        if len(e_rows) != len(g_rows):
            print(f"FAIL {name}: rows {len(g_rows)} != {len(e_rows)}")
            failed.append(name)
            continue
        bad = [(a, b) for a, b in zip(g_rows, e_rows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(e_rows)} rows differ; first: got={bad[0][0]} exp={bad[0][1]}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(e_rows)} rows)")
    # rows-only queries (no oracle): check non-empty
    import glob, os
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name in oracle or not os.path.isdir(d):
            continue
        n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
        status = "OK  " if n > 0 else "FAIL"
        if n == 0:
            failed.append(name)
        print(f"{status} {name} (rows-only: {n} rows)")
    print(f"\n{len(failed)} failures" + (": " + ", ".join(failed) if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
