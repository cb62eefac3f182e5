#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads Verify output (outDir/<name>/ parquet + outDir/oracle_sql.json),
registers the sf-dir parquet tables as DuckDB views, runs each oracle SQL,
and compares: column names (sorted), column TYPES (the driver's value hash
is typed — DuckDB HUGEINT vs Spark BIGINT is a failure even when the
values match, which Python fetchall() erases), row count, and the exact
multiset of row values (floats compared bit-exact; small tolerance
fallback reported separately so near-misses are visible).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def rows_key(rows):
    return sorted(tuple(repr(x) for x in r) for r in rows)

def fresh_con(sf_dir):
    con = duckdb.connect()
    # an in-memory connection cannot spill by default: across ~250 oracle
    # replays (recursive-CTE pagerank/kmeans, MaxSim chains) the buffer
    # pool exhausts and every later query dies "Out of Memory" — give it
    # a spill dir and a bounded limit so heavy oracles page instead
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

def main(sf_dir, out_dir, json_out=None):
    con = fresh_con(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # An empty oracle map is a broken dump, not a green round (round 11's
    # driver artifact shipped as {} and read as silently green).
    if not oracle:
        print("FAIL: oracle_sql.json is EMPTY — refusing to report green")
        return 1
    results = {}
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        def run_both(c):
            got_rel = c.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gc, gt = list(got_rel.columns), [str(t) for t in got_rel.types]
            g = got_rel.fetchall()
            exp_rel = c.sql(sql)
            ec, et = list(exp_rel.columns), [str(t) for t in exp_rel.types]
            return gc, gt, g, ec, et, exp_rel.fetchall()
        try:
            try:
                got_cols, got_types, got, exp_cols, exp_types, exp = run_both(con)
            except Exception:
                # a transient engine failure (OOM after many replays) must
                # not read as a wrong answer: retry once on a fresh
                # connection before reporting
                con.close()
                con = fresh_con(sf_dir)
                got_cols, got_types, got, exp_cols, exp_types, exp = run_both(con)
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:300]}")
            results[name] = {"status": "error", "detail": str(e)[:300]}
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            results[name] = {"status": "cols_mismatch",
                             "spark_cols": sorted(got_cols),
                             "oracle_cols": sorted(exp_cols)}
            n_fail += 1
            continue
        type_diffs = [
            (c, got_types[got_cols.index(c)], exp_types[exp_cols.index(c)])
            for c in exp_cols
            if got_types[got_cols.index(c)] != exp_types[exp_cols.index(c)]]
        if type_diffs:
            print(f"FAIL {name}: TYPE mismatch (col, spark, oracle): {type_diffs}")
            results[name] = {"status": "type_mismatch", "detail": repr(type_diffs)}
            n_fail += 1
            continue
        # duplicate column names would make index() silently misalign
        # values (both duplicates map to the first index)
        if len(set(got_cols)) != len(got_cols) or len(set(exp_cols)) != len(exp_cols):
            print(f"FAIL {name}: duplicate column names spark={got_cols} oracle={exp_cols}")
            results[name] = {"status": "dup_cols",
                             "spark_cols": got_cols, "oracle_cols": exp_cols}
            n_fail += 1
            continue
        # reorder got rows into oracle column order
        idx = [got_cols.index(c) for c in exp_cols]
        got2 = [tuple(r[i] for i in idx) for r in got]
        if len(got2) != len(exp):
            print(f"FAIL {name}: rows spark={len(got2)} oracle={len(exp)}")
            results[name] = {"status": "rows_mismatch", "spark_rows": len(got2), "oracle_rows": len(exp)}
            n_fail += 1
            continue
        if rows_key(got2) == rows_key(exp):
            print(f"OK   {name}: {len(exp)} rows exact")
            results[name] = {"status": "ok", "rows": len(exp)}
            n_ok += 1
        else:
            # find first diff for diagnostics
            gs, es = rows_key(got2), rows_key(exp)
            diffs = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            approx = all(
                all(_close(x, y) for x, y in zip(a, b))
                for a, b in zip(sorted(got2, key=repr), sorted(exp, key=repr)))
            tag = "APPROX-ONLY" if approx else "MISMATCH"
            print(f"FAIL {name}: {tag}; first diffs: {diffs}")
            results[name] = {"status": tag.lower(), "detail": repr(diffs)[:300]}
            n_fail += 1
    print(f"== {n_ok} ok / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"n_ok": n_ok, "n_fail": n_fail, "sf_dir": sf_dir,
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

def _close(x, y):
    if isinstance(x, float) and isinstance(y, float):
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
    return repr(x) == repr(y)

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    jout = sys.argv[3] if len(sys.argv) > 3 else None
    sys.exit(main(sf, out, jout))
