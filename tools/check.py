#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

For each query result parquet under <verify_out_dir>, runs the matching
oracle SQL (oracle_sql.json) in DuckDB against the sf tables, sorts
columns by name, sorts rows, and compares values (exact for
ints/strings, tiny tolerance report for floats so we can see how close
an exact hash would be).
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        got, exp = canon(got), canon(exp)
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(got.columns)} exp={list(exp.columns)}"
            continue
        # physical-type drift that value-compares can't see: DuckDB
        # widening (e.g. windowed sum(BIGINT) -> HUGEINT, which pandas
        # loads as object/float64) hash-mismatches at the driver even
        # when every value is identical — x3 was red for two rounds on
        # exactly this. Only integer-ness drift is flagged: DATE/TIMESTAMP
        # representation differs between pandas readers (object vs
        # datetime64) without any driver-visible effect.
        def intish(s): return pd.api.types.is_integer_dtype(s) or \
            pd.api.types.is_bool_dtype(s)
        dtype_drift = [c for c in got.columns
                       if intish(got[c]) != intish(exp[c])]
        if dtype_drift:
            results[name] = ("DTYPE_MISMATCH " + ", ".join(
                f"{c}: got={got[c].dtype} exp={exp[c].dtype}" for c in dtype_drift))
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT_MISMATCH got={len(got)} exp={len(exp)}"
            continue
        status, max_rel = "MATCH", 0.0
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
                gv = pd.to_numeric(g, errors="coerce")
                ev = pd.to_numeric(e, errors="coerce")
                both_nan = gv.isna() & ev.isna()
                diff = (gv - ev).abs()
                scale = ev.abs().clip(lower=1.0)
                rel = (diff / scale).fillna(0.0)
                rel[both_nan] = 0.0
                if gv.isna().ne(ev.isna()).any():
                    status = f"NULL_MISMATCH col={c}"; break
                m = float(rel.max()) if len(rel) else 0.0
                max_rel = max(max_rel, m)
                if m > 0:
                    # exact-hash would fail; flag if beyond tiny fuzz
                    if m > 1e-9:
                        status = f"VALUE_MISMATCH col={c} max_rel={m:.3e}"; break
            else:
                ga = g.astype(str).where(~g.isna(), "<NULL>")
                ea = e.astype(str).where(~e.isna(), "<NULL>")
                if not ga.equals(ea):
                    bad = (ga != ea)
                    i = int(bad.idxmax())
                    status = f"VALUE_MISMATCH col={c} row{i} got={ga[i]!r} exp={ea[i]!r}"
                    break
        if status == "MATCH" and max_rel > 0:
            status = f"MATCH (float fuzz max_rel={max_rel:.1e})"
        results[name] = status
    n_ok = sum(1 for v in results.values() if v.startswith("MATCH"))
    for k, v in sorted(results.items()):
        print(f"{'OK ' if v.startswith('MATCH') else 'FAIL' if not v.startswith('ROWS_ONLY') else 'ROWS'}  {k}: {v}")
    print(f"\n{n_ok}/{len(results)} exact-or-fuzz matches")

if __name__ == "__main__":
    main()
