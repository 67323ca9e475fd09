#!/usr/bin/env python3
"""Dev-only driver mimic (NOT part of the engine): compares Verify output
parquet against the DuckDB oracle SQL the way the round driver does —
pandas frames, columns sorted by name, rows sorted by all columns, values
compared exactly (stringified, NO rounding).

Why pandas and not arrow: the driver's observed failure modes are
pandas-level — DuckDB DECIMAL comes back float64 ('5.7') while a Spark
decimal128 parquet read gives Decimal('5.70'), and pandas' sort_values
crashes on ndarray cells. An arrow-level compare (the old version of this
script) is blind to both, which is exactly how 9 representation-red
queries and 2 harness crashes shipped in round 2.

Usage:
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob, json, os, sys
import duckdb
import pandas as pd


def canon(v):
    """Stringify a cell the way a value-hash would see it. No rounding:
    if the two engines' representations differ, we must fail here."""
    if v is None or (isinstance(v, float) and v != v):
        return "<null>"
    return str(v)


def frame_rows(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols).reset_index(drop=True)  # crashes on ndarray cells, like the driver
    return cols, [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = rows_only = 0
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # An oracle query whose Spark run crashed writes NO output dir
    # (Verify catches per-query exceptions) — that must read as FAIL, not
    # silently vanish from the loop.
    for name in sorted(set(oracle) - set(qdirs)):
        print(f"FAIL {name}: oracle entry but no Spark output (query crashed?)")
        bad += 1
    for name in qdirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            gcols, grows = frame_rows(got)  # sortability check even without oracle
        except Exception as ex:
            print(f"ERR  {name}: spark output unloadable/unsortable: {ex}")
            bad += 1
            continue
        if name not in oracle:
            print(f"rows {name}: {len(grows)} rows (no oracle)")
            rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
            ecols, erows = frame_rows(exp)
            if ecols != gcols:
                print(f"FAIL {name}: columns {gcols} != {ecols}"); bad += 1; continue
            gdt = [str(got[c].dtype) for c in gcols]
            edt = [str(exp[c].dtype) for c in ecols]
            if gdt != edt:
                print(f"warn {name}: dtypes spark={gdt} oracle={edt}")
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
    print(f"\n{ok} ok, {bad} bad, {rows_only} rows-only")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
