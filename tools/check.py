#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the corresponding Spark result parquet from
<outDir>/<name>/, sorts columns by name + rows, and compares cell-by-cell.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, math, sys, glob, os
import duckdb

def canon(rows, cols):
    """columns sorted by name, rows sorted by string repr."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        import decimal
        if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
            return float(a) == float(b)
    except Exception:
        pass
    return a == b

def close(a, b):
    try:
        return abs(float(a) - float(b)) <= 1e-6 * max(1.0, abs(float(a)))
    except Exception:
        return False

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sres = con.execute(f"SELECT * FROM read_parquet({spark_glob!r})")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
        oc, orr = canon(orows, ocols)
        sc, srr = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}")
            n_fail += 1
            continue
        # Typed check: driver hashes pandas-converted values. All <=64-bit int
        # types stringify identically, but HUGEINT converts to float64
        # ("123.0" != "123"), so SUM(int) oracles must be CAST to BIGINT.
        # Round-1 evidence: INTEGER-vs-BIGINT queries were hash-green, the 7
        # HUGEINT ones were not.
        def tclass(t):
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int64ish"
            return t
        otypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        stypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({spark_glob!r})").fetchall()}
        tbad = [(c, otypes.get(c), stypes.get(c)) for c in oc
                if tclass(otypes.get(c)) != tclass(stypes.get(c))]
        if tbad:
            c, ot, st = tbad[0]
            print(f"FAIL {name}: TYPE col {c}: oracle={ot} spark={st}")
            n_fail += 1
            continue
        if len(orr) != len(srr):
            print(f"FAIL {name}: rowcount spark={len(srr)} oracle={len(orr)}")
            n_fail += 1
            continue
        bad = None
        for i, (ro, rs) in enumerate(zip(orr, srr)):
            for j, (a, b) in enumerate(zip(ro, rs)):
                if not cells_equal(a, b):
                    kind = "FP-CLOSE" if close(a, b) else "VALUE"
                    bad = (i, oc[j], a, b, kind)
                    break
            if bad:
                break
        if bad:
            i, cname, a, b, kind = bad
            print(f"FAIL {name}: {kind} row {i} col {cname}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
