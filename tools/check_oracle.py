#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump written by graft.Verify,
runs the matching SQL from oracle_sql.json against the sfDir tables in
DuckDB, sorts columns by name and rows by all columns, and compares
values exactly. Prints one line per query: OK / MISMATCH / ERROR.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0  # normalize -0.0
                vals.append(repr(v))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            print(f"MISMATCH {name}: columns {gc} vs {ec}")
            n_bad += 1
        elif gr != er:
            diff = sum(1 for a, b in zip(gr, er) if a != b) + abs(len(gr) - len(er))
            print(f"MISMATCH {name}: rows {len(gr)} vs {len(er)}, {diff} differing")
            for a, b in list(zip(gr, er))[:1000]:
                if a != b:
                    print(f"  got {a}\n  exp {b}")
                    break
            n_bad += 1
        else:
            print(f"OK       {name}: {len(gr)} rows")
            n_ok += 1
    print(f"-- {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
