"""Dev harness: compare spark vs duckdb for every registry query on sf0.01
(or $SPARK_GRAFT_PARITY_SF_DIR — e.g. sf0.1 for a deeper sweep than the
driver's own gate).

Mimics the driver's order-insensitive value-hash compare (exact values).
"""
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
from bioanalyzer_backend_spark.plans.catalog_queries import registry
from bioanalyzer_backend_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, sdf, ddf):
    s, d = canon(sdf), canon(ddf)
    ok_rows = len(s) == len(d)
    ok_cols = list(s.columns) == list(d.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
            ok_vals = True
        except AssertionError as e:
            print(f"[{name}] VALUE MISMATCH: {str(e)[:1500]}")
    status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
    print(f"[{name}] {status} rows={len(s)}/{len(d)} cols_ok={ok_cols}")
    if not ok_cols:
        print("  spark:", list(s.columns), "\n  duck :", list(d.columns))
    return ok_rows and ok_cols and ok_vals


def main():
    only = sys.argv[1:] or None
    reg = registry()
    if only:
        unknown = [n for n in only if n not in reg]
        if unknown:
            # a typo must NOT produce a silent '0 ok, 0 fail' green exit
            print(f"unknown query name(s): {unknown}; "
                  f"known: {sorted(reg)}")
            sys.exit(2)
    spark = build_session("parity-dev", master="local[8]")
    con = duckdb.connect()
    for t in ("documents", "events", "lineitem", "orders", "customer",
              "nation", "region", "supplier", "part", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    n_ok = n_fail = 0
    for name, (spark_fn, duck_sql) in reg.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spark_fn(spark, SF).toPandas()
        except Exception as e:
            print(f"[{name}] SPARK ERROR: {str(e)[:800]}")
            n_fail += 1
            continue
        if duck_sql is None:
            print(f"[{name}] rows-only: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_ok += 1
            continue
        try:
            ddf = con.execute(duck_sql).df()
        except Exception as e:
            print(f"[{name}] DUCK ERROR: {str(e)[:800]}")
            n_fail += 1
            continue
        if compare(name, sdf, ddf):
            n_ok += 1
        else:
            n_fail += 1
        print(f"  ({time.time()-t0:.1f}s)")
    print(f"\n{n_ok} ok, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
