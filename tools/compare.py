#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfdir> <verify_outdir>

Reads each <outdir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB over the sf tables, sorts columns by name and
rows by value, and reports schema/rowcount/value mismatches.
"""
import sys, json, glob, math
import duckdb

def canon(rows):
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            # driver-style value hash: canonicalize -0.0 and format
            if v == 0.0: v = 0.0
            return f"{v!r}"
        return repr(v)
    return sorted(tuple(norm(v) for v in r) for r in rows)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(x.split("/")[-1] for x in glob.glob(f"{outdir}/q*") + glob.glob(f"{outdir}/[a-p,r-z]*") if not x.endswith(".json")):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files: continue
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"SKIP  {name}: rows={len(got)} (no oracle)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL  {name}: columns {gcols} vs {ecols}")
            n_fail += 1
            continue
        g = canon(got[gcols].itertuples(index=False, name=None))
        e = canon(exp[ecols].itertuples(index=False, name=None))
        if len(g) != len(e):
            print(f"FAIL  {name}: rowcount {len(g)} vs {len(e)}")
            n_fail += 1
        elif g != e:
            diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL  {name}: values differ, e.g. rows {diff}")
            for i in diff[:2]:
                print(f"      got {g[i]}\n      exp {e[i]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
