#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tooling only —
the shipped Scala library does not depend on this). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json run over views named after the sfDir tables.
"""
import json, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows by string repr — order-insensitive
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                vals.append(v.hex() if not math.isnan(v) else "nan")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            mcols, mrows = canon(mine.fetchall(), [c for c in mine.columns])
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); n_bad += 1; continue
        try:
            ref = con.sql(sql)
            rcols, rrows = canon(ref.fetchall(), [c for c in ref.columns])
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_bad += 1; continue
        if mcols != rcols:
            print(f"FAIL {name}: columns {mcols} != {rcols}"); n_bad += 1; continue
        if len(mrows) != len(rrows):
            print(f"FAIL {name}: rowcount {len(mrows)} != {len(rrows)}"); n_bad += 1
            for a, b in list(zip(mrows, rrows))[:3]:
                if a != b: print(f"   spark={a}\n   duck ={b}")
            continue
        diffs = [(a, b) for a, b in zip(mrows, rrows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(mrows)} rows differ")
            for a, b in diffs[:3]:
                print(f"   spark={a}\n   duck ={b}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(mrows)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
