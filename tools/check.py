#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev feedback loop only —
the shipped Scala library does not depend on this).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name and rows by all columns, and compares values.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda t: tuple(map(repr, t)))

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def describe_types(con, sql):
    """Column -> DuckDB type string for a query, via binder-only DESCRIBE."""
    return {r[0]: r[1] for r in con.execute("DESCRIBE " + sql).fetchall()}

def lint_types(con, out_dir, name, sql):
    """Oracle output-type lint (round-14, VERDICT r13 item 2): the round-13
    bitext reds were value-equal rows whose oracle column was HUGEINT —
    DuckDB 1.0.0 serializes HUGEINT as float64 (pandas) / decimal128
    (Arrow), so a typed harness sees a hash skew that this script's
    fetchall() compare (plain Python ints) structurally cannot. Fail any
    oracle emitting HUGEINT/UHUGEINT, and any DECIMAL output column whose
    Spark parquet column is not itself decimal (bare sum() over BIGINT and
    INTEGER-literal CASE branches are the two known widening paths)."""
    otypes = describe_types(con, sql)
    stypes = describe_types(
        con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
    errs = []
    for c, t in otypes.items():
        tu = t.upper()
        if "HUGEINT" in tu:
            errs.append(f"{c}: oracle {t}")
        elif tu.startswith("DECIMAL") and \
                not stypes.get(c, "").upper().startswith("DECIMAL"):
            errs.append(f"{c}: oracle {t} vs spark {stypes.get(c)}")
    return errs

def main(sf_dir, out_dir):
    import platform
    print(f"oracle env: duckdb={duckdb.__version__} "
          f"python={platform.python_version()} {platform.platform()}")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:
            print(f"[warn] view {t}: {e}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            nfail += 1
            continue
        try:
            terrs = lint_types(con, out_dir, name, sql)
        except Exception as e:
            terrs = [f"lint error: {e}"]
        if terrs:
            print(f"FAIL {name}: oracle type lint: {terrs}")
            nfail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: schema mismatch spark={gc} oracle={ec}")
            nfail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount spark={len(gr)} oracle={len(er)}")
            nfail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            npass += 1
    print(f"== {npass} pass / {nfail} fail")
    return 1 if nfail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
