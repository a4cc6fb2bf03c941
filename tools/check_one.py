#!/usr/bin/env python3
"""Check ONE query dumped by graft.VerifyOne (<outDir>/<name>/ + <name>.sql)
against its DuckDB oracle — same canonicalization as tools/check.py.

Usage: python3 tools/check_one.py <sfDir> <outDir> <name> [name...]
"""
import sys, os, glob, json, math
import duckdb

sys.path.insert(0, os.path.dirname(__file__))
from check import canon, cells_equal, close  # noqa: E402


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rc = 0
    for name in names:
        sql = open(f"{out_dir}/{name}.sql").read()
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        ores = con.execute(sql)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        sres = con.execute(f"SELECT * FROM read_parquet({spark_glob!r})")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
        oc, orr = canon(orows, ocols)
        sc, srr = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: schema spark={sc} oracle={oc}")
            rc = 1
            continue
        if len(orr) != len(srr):
            print(f"FAIL {name}: rowcount spark={len(srr)} oracle={len(orr)}")
            rc = 1
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
            i, cn, a, b, kind = bad
            print(f"FAIL {name}: {kind} row {i} col {cn}: oracle={a!r} spark={b!r}")
            rc = 1
        else:
            print(f"PASS {name} ({len(srr)} rows)")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
