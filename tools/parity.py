#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB oracles.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Mimics the driver's CORRECTNESS check: for each query, load the Spark
result parquet and the DuckDB result of oracle_sql.json, sort columns by
name, sort rows, compare values exactly (with a small float report).
Dev tooling only — the engine itself is pure Scala/Spark.
"""
import json, sys, glob, math
import duckdb

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_RESULT"
            continue
        try:
            spark_df = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            results[name] = f"SCHEMA: spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWS: spark={len(spark_df)} duck={len(duck_df)}"
            continue
        # driver's hash gate is dtype-sensitive (int width tolerated,
        # int-vs-float NOT — DuckDB HUGEINT renders as float64)
        dt_bad = []
        for c in spark_df.columns:
            sk, dk = spark_df[c].dtype.kind, duck_df[c].dtype.kind
            if sk != dk and {sk, dk} != {"i", "u"}:
                dt_bad.append((c, str(spark_df[c].dtype), str(duck_df[c].dtype)))
        if dt_bad:
            results[name] = f"DTYPE: {dt_bad}"
            continue
        mism = []
        for c in spark_df.columns:
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            bad = [(i, sv[i], dv[i]) for i in range(len(sv)) if not values_equal(sv[i], dv[i])]
            if bad:
                mism.append((c, bad[:3], len(bad)))
        results[name] = "OK" if not mism else f"VALUES: {mism}"
    # queries without oracle → rows-only: the driver still loads the
    # parquet and sort_values's it in pandas, which crashes on array
    # columns — simulate that here so it can't surprise us in CI
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = d.split("/")[-1]
        if name in oracles:
            continue
        try:
            df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
            canon(df)
            results[name] = "OK" if len(df) > 0 else "ROWS: spark=0 (rows-only)"
        except Exception as e:
            results[name] = f"ERROR(rows-only sort): {e}"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, status in sorted(results.items()):
        mark = "PASS" if status == "OK" else "FAIL"
        print(f"{mark} {name}: {status if status != 'OK' else ''}")
    print(f"\n{n_ok}/{len(results)} queries match")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
