#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: oracle_check.py <verifyOutDir> <sfDir> [query ...]

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
with each sf table registered as a view over its parquet file, load the
Spark result parquet from <verifyOutDir>/<name>/, sort columns by name,
sort rows, and compare values (floats to 1e-6 relative).
"""
import sys, os, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "partsupp",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    tbl = pq.read_table(sorted(files)[0])
    for f in sorted(files)[1:]:
        import pyarrow as pa
        tbl = pa.concat_tables([tbl, pq.read_table(f)])
    return tbl


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.6g}")
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_of(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, sorted(
        (tuple(norm(v) for v in row) for row in zip(*data)), key=repr)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    # Record the oracle environment (VERDICT r11 item 3): a hash mismatch
    # that reproduces on one DuckDB build but not another is an engine
    # divergence, not a kernel bug — the version line makes that diagnosis
    # a one-look check instead of a re-derivation.
    import platform
    env = {"duckdb": duckdb.__version__,
           "python": platform.python_version(),
           "platform": platform.platform()}
    print(f"oracle env: duckdb={env['duckdb']} python={env['python']} "
          f"{env['platform']}")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        r = {"rows_match": False, "schema_match": False,
             "hash_match": False, "err": None}
        try:
            spark_tbl = load_spark(outdir, name)
            if spark_tbl is None:
                r["err"] = "no spark output"
                results[name] = r
                continue
            otbl = con.execute(sql).fetch_arrow_table()
            scols, srows = rows_of(spark_tbl)
            ocols, orows = rows_of(otbl)
            r["spark_rows"], r["oracle_rows"] = len(srows), len(orows)
            r["rows_match"] = len(srows) == len(orows)
            r["schema_match"] = scols == ocols
            if not r["schema_match"]:
                r["err"] = f"schema spark={scols} oracle={ocols}"
            r["hash_match"] = srows == orows
            if r["rows_match"] and r["schema_match"] and not r["hash_match"]:
                for a, b in zip(srows, orows):
                    if a != b:
                        r["err"] = f"first diff: spark={a} oracle={b}"
                        break
        except Exception as e:
            r["err"] = f"{type(e).__name__}: {e}"[:400]
        results[name] = r
    npass = sum(1 for v in results.values()
                if v["rows_match"] and v["schema_match"] and v["hash_match"])
    spark_names = {os.path.basename(d) for d in glob.glob(outdir + "/*")
                   if os.path.isdir(d)}
    no_oracle = sorted(spark_names - set(oracle))
    for name, v in sorted(results.items()):
        ok = v["rows_match"] and v["schema_match"] and v["hash_match"]
        if not ok:
            print(f"FAIL {name}: {json.dumps(v)}")
    print(f"\n{npass}/{len(results)} pass; no_oracle (rows-only): {no_oracle}")
    json.dump({"env": env, "results": results},
              open("/tmp/oracle_check.json", "w"), indent=1)


if __name__ == "__main__":
    main()
