#!/usr/bin/env python3
"""Dev-only driver mimic (NOT part of the engine): compares Verify output
parquet against the DuckDB oracle SQL, the way the round driver does
(columns sorted by name, values compared row-wise after the query's own
deterministic ORDER BY). Usage:
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, math
import duckdb

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
            ecols = sorted(exp.column_names)
            gcols = sorted(got.column_names)
            if ecols != gcols:
                print(f"FAIL {name}: columns {gcols} != {ecols}"); bad += 1; continue
            erows = [tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist()]
            grows = [tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()]
            if len(erows) != len(grows):
                print(f"FAIL {name}: rows {len(grows)} != {len(erows)}"); bad += 1; continue
            diffs = [(i, g, e) for i, (g, e) in enumerate(zip(grows, erows)) if g != e]
            if diffs:
                i, g, e = diffs[0]
                print(f"FAIL {name}: {len(diffs)} differing rows; first @{i}:\n  got {g}\n  exp {e}")
                bad += 1
            else:
                print(f"ok   {name}: {len(grows)} rows"); ok += 1
        except Exception as ex:
            print(f"ERR  {name}: {ex}"); bad += 1
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
