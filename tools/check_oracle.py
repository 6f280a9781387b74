#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump written by graft.Verify,
runs the matching SQL from oracle_sql.json against the sfDir tables in
DuckDB, and compares THE WAY THE DRIVER DOES: both sides converted to
pandas DataFrames, columns sorted by name, rows sorted by all columns
via pandas sort_values, values compared after dtype-faithful rendering.

Why pandas and not fetchall(): round 2 shipped two driver-red queries
that this script (then repr-of-tuples-based) passed locally —
  * DuckDB types sum(BIGINT) as HUGEINT; pandas renders HUGEINT float64,
    so 123 hashes as 123.0 against Spark's int64 123 → hash mismatch.
  * An array-typed output column reaches pandas as ndarray, which
    sort_values cannot factorize → driver "err" entry.
Both failure modes are invisible to fetchall()+repr. This script now
additionally FAILS FAST on any oracle or Spark result whose schema
contains a HUGEINT / list / struct column, with a named hint, so the
bug class cannot ship green again.

Prints one line per query: OK / MISMATCH / BADTYPE / ERROR.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB logical types pandas cannot round-trip faithfully (HUGEINT →
# float64) or sort (LIST/STRUCT → ndarray/dict objects). Any compared
# column with one of these types is a shipping bug, not a comparison
# detail, so it gets its own verdict line.
BAD_TYPE_MARKERS = ("HUGEINT", "UHUGEINT", "[]", "STRUCT", "MAP")


def bad_typed_cols(rel):
    """Flag columns whose DuckDB LOGICAL type pandas mangles. Types come
    from the relation's .types (real logical types: HUGEINT, BIGINT[],
    STRUCT(...)) — the DB-API cursor description collapses them to generic
    codes ('NUMBER' for HUGEINT and BIGINT alike), which made the r3
    edition of this check dead code for the HUGEINT class (advice r3)."""
    bad = []
    for name, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if any(m in ts for m in BAD_TYPE_MARKERS):
            bad.append((name, str(t)))
    return bad


def selftest():
    """The guarantee the docstring makes, executed: a sum(BIGINT) oracle
    (HUGEINT), a list and a struct column must be flagged by name; a
    CAST(... AS BIGINT) must pass."""
    con = duckdb.connect()
    r = con.sql("SELECT sum(x) AS s FROM (VALUES (1::BIGINT), (2::BIGINT)) t(x)")
    assert bad_typed_cols(r) == [("s", "HUGEINT")], bad_typed_cols(r)
    assert bad_typed_cols(con.sql("SELECT [1, 2] AS l")), "list not flagged"
    assert bad_typed_cols(con.sql("SELECT {'a': 1} AS st")), "struct not flagged"
    ok = con.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1::BIGINT)) t(x)")
    assert not bad_typed_cols(ok), bad_typed_cols(ok)
    print("selftest ok: HUGEINT/list/struct flagged, BIGINT clean")
    return 0


def render(v):
    """Dtype-faithful scalar rendering: float64 123.0 and int64 123 must
    NOT compare equal (that is exactly the HUGEINT failure mode)."""
    if not isinstance(v, (str, bytes)) and hasattr(v, "item"):
        try:
            v = v.item()  # numpy scalar → python scalar
        except Exception:
            pass
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def canon(df):
    """The driver's canonicalization: sort columns by name, rows by all
    columns (pandas sort_values — throws on unhashable cells exactly like
    the driver), then render every value dtype-faithfully."""
    df = df[sorted(df.columns)]
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    rows = [tuple(render(v) for v in row) for row in df.itertuples(index=False)]
    return list(df.columns), rows


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
            # con.sql returns a relation exposing LOGICAL types (.types);
            # con.execute's cursor description does not distinguish
            # HUGEINT from BIGINT (advice r3)
            got_rel = con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            got_bad = bad_typed_cols(got_rel)
            got = got_rel.df()
            exp_rel = con.sql(sql)
            exp_bad = bad_typed_cols(exp_rel)
            exp = exp_rel.df()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        if got_bad or exp_bad:
            side = ("spark", got_bad) if got_bad else ("oracle", exp_bad)
            print(f"BADTYPE  {name}: {side[0]} columns {side[1]} — "
                  f"HUGEINT needs CAST(... AS BIGINT); lists need "
                  f"array_join/array_to_string or explode")
            n_bad += 1
            continue
        try:
            gc, gr = canon(got)
            ec, er = canon(exp)
        except Exception as e:
            # pandas sort_values throwing == the driver's "err" entry
            print(f"ERROR    {name}: pandas canon failed: {str(e)[:200]}")
            n_bad += 1
            continue
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
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
