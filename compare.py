#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 compare.py <sfDir> <verifyOutDir>

For every <name>/ parquet dir in verifyOutDir, runs oracle_sql.json[name]
in DuckDB (tables = sfDir parquet files) and compares: column names (sorted),
dtypes (loosely), and the sorted row multiset (exact; floats via repr).
"""
import json, sys, math
import duckdb

def canon(rows, cols):
    # sort columns by name, rows by stringified tuple
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(round(v, 9)))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    import os as _os
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        pat = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (e.g. the generated sf1 copies) are
        # DIRECTORIES of part files — glob them for DuckDB
        if _os.path.isdir(pat):
            pat = f"{pat}/*.parquet"
        elif not _os.path.exists(pat):
            continue  # partial sf dirs (e.g. the generated sf1 set) are fine
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    names = [d for d in sorted(os.listdir(out_dir)) if os.path.isdir(f"{out_dir}/{d}")]
    n_pass = n_fail = 0
    for name in names:
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}"); n_fail += 1; continue
        if name not in oracle:
            status = "ROWS-ONLY" if len(grows) > 0 else "ROWS-ONLY-EMPTY(!)"
            print(f"{status:10s} {name}: rows={len(grows)}")
            if len(grows) == 0: n_fail += 1
            else: n_pass += 1
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        # Driver parity: the driver converts both sides via pandas. fetchall()
        # yields Python ints for DuckDB HUGEINT, but .df() renders HUGEINT as
        # float64 ("3549" -> "3549.0") which breaks the driver's value hash
        # even when fetchall()-based compare passes. Catch that dtype skew here.
        try:
            # LIMIT 0 preserves pandas dtypes without re-running the query
            gdt = {c: str(d.kind) for c, d in
                   con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").df().dtypes.items()}
            edt = {c: str(d.kind) for c, d in
                   con.execute(f"SELECT * FROM ({oracle[name]}) __q LIMIT 0").df().dtypes.items()}
            skew = [(c, gdt[c], edt[c]) for c in gdt
                    if c in edt and gdt[c] != edt[c]
                    and {gdt[c], edt[c]} <= {"i", "u", "f"} and "f" in {gdt[c], edt[c]}]
            if skew:
                print(f"FAIL {name}: pandas dtype skew (driver hash would differ): {skew}")
                n_fail += 1; continue
        except Exception as e:
            print(f"WARN {name}: dtype check skipped: {e}")
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}"); n_fail += 1; continue
        if gr != er:
            bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}"); n_fail += 1; continue
        print(f"PASS       {name}: rows={len(gr)}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
