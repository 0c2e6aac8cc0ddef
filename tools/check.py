#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has been run already
(or run with --run to invoke it). For each query result parquet under
outDir, runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same testdata parquet tables, canonicalizes row order (sort by all columns,
nulls first), and compares cell-by-cell exactly.

Type gate (r11): the driver's hash canonicalization distinguishes DuckDB's
widened integer types (HUGEINT from un-cast sum()/`//` chains) from the
Spark parquet schema's BIGINT even when every cell is numerically equal —
the r10 root cause. So before comparing cells we compare DuckDB logical
types of the oracle against the result parquet's types: the int family
(TINYINT..BIGINT) is normalized (pandas lands all of them in int64, and
the driver greens INTEGER-vs-BIGINT), everything else must match exactly,
and HUGEINT/UHUGEINT/DECIMAL anywhere in the oracle is an unconditional
fail. `--lint` runs ONLY that oracle-typing scan (no result parquet
needed beyond oracle_sql.json), for use as a pre-commit regression gate.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    import numpy as np
    for c in cols:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: tuple(v.tolist() if isinstance(v, np.ndarray) else v)
                if v is not None else None)
    df = df.sort_values(by=cols, na_position="first").reset_index(drop=True)
    return df


INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}


def type_norm(t):
    t = str(t)
    return "INT" if t in INT_FAMILY else t


def widened(t):
    t = str(t)
    return t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")


def oracle_type_leaks(con, sql):
    """Columns of `sql` whose DuckDB logical type the driver's hash
    canonicalization cannot reconcile with any Spark parquet type."""
    rel = con.sql(sql)
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types) if widened(t)]


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return (a is None) == (b is None)
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
    import numpy as np
    if isinstance(a, np.ndarray):
        a = a.tolist()
    if isinstance(b, np.ndarray):
        b = b.tolist()
    return a == b


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = Path(args[1] if len(args) > 1 else "target/verify_out")
    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            check=True)

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # Spark-name bridges for the FUZZ grammar's array ops (used only by
    # Fuzz-generated SQL; SparkEntry.oracleSql never relies on these —
    # the driver's own gate has no such macros). Same 1-based indexing,
    # same null-in/null-out semantics.
    con.execute("CREATE MACRO size(l) AS len(l)")
    con.execute("CREATE MACRO element_at(l, i) AS list_extract(l, i)")
    # the untyped macro param binds as NULL at definition time, so pin
    # the overload with an explicit TIMESTAMP cast (lossless: the fuzz
    # grammar only ever passes CAST(ts AS TIMESTAMP))
    con.execute(
        "CREATE MACRO unix_micros(t) AS epoch_us(CAST(t AS TIMESTAMP))")

    if "--lint" in sys.argv:
        leaks = 0
        for name in sorted(oracle):
            try:
                bad = oracle_type_leaks(con, oracle[name])
            except Exception as e:
                leaks += 1
                print(f"LINT-FAIL [oracle-error] {name}: {e}")
                continue
            if bad:
                leaks += 1
                print(f"LINT-FAIL [widened-type] {name}: {bad}")
        print(f"{len(oracle)} oracles, {leaks} with widened-type leaks")
        sys.exit(1 if leaks else 0)

    n_pass = n_fail = n_noracle = 0
    results = sorted(p.name for p in out_dir.iterdir() if p.is_dir())
    for name in results:
        try:
            got = canon(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            n_fail += 1
            print(f"FAIL [result-unreadable] {name}: {e}")
            continue
        if name not in oracle:
            n_noracle += 1
            print(f"  [no-oracle] {name}: {len(got)} rows")
            continue
        try:
            exp = canon(con, oracle[name])
        except Exception as e:
            n_fail += 1
            print(f"FAIL [oracle-error] {name}: {e}")
            continue
        if list(exp.columns) != list(got.columns):
            n_fail += 1
            print(f"FAIL [cols] {name}: oracle={list(exp.columns)} got={list(got.columns)}")
            continue
        leaks = oracle_type_leaks(con, oracle[name])
        if leaks:
            n_fail += 1
            print(f"FAIL [widened-type] {name}: {leaks}")
            continue
        ot = {c: str(t) for c, t in zip(con.sql(oracle[name]).columns,
                                        con.sql(oracle[name]).types)}
        grel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        gt = {c: str(t) for c, t in zip(grel.columns, grel.types)}
        tdiff = {c: (ot[c], gt[c]) for c in ot
                 if type_norm(ot[c]) != type_norm(gt[c])}
        if tdiff:
            n_fail += 1
            print(f"FAIL [type] {name}: {tdiff}")
            continue
        if len(exp) != len(got):
            n_fail += 1
            print(f"FAIL [rows] {name}: oracle={len(exp)} got={len(got)}")
            continue
        bad = None
        for ci, c in enumerate(exp.columns):
            ev, gv = exp[c].tolist(), got[c].tolist()
            for ri in range(len(ev)):
                if not cell_eq(ev[ri], gv[ri]):
                    bad = (c, ri, ev[ri], gv[ri])
                    break
            if bad:
                break
        if bad:
            n_fail += 1
            c, ri, e, g = bad
            print(f"FAIL [cell] {name}: col={c} row={ri} oracle={e!r} got={g!r}")
        else:
            n_pass += 1
            print(f"  pass {name} ({len(got)} rows)")
    missing = set(oracle) - set(results)
    for name in sorted(missing):
        n_fail += 1
        print(f"FAIL [missing-result] {name}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
