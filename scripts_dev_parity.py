"""Dev harness: compare spark vs duckdb rendering of sqlgen queries on sf0.01.

Mimics the driver's order-insensitive value-hash compare.
"""
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
from bioanalyzer_backend_spark import sqlgen
from bioanalyzer_backend_spark.session import build_session, register_testdata_views

SF = "/root/testdata/sf0.01"


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
            print(f"[{name}] VALUE MISMATCH: {str(e)[:2000]}")
    print(f"[{name}] rows={len(s)}/{len(d)} ok_rows={ok_rows} ok_cols={ok_cols} ok_vals={ok_vals}")
    if not ok_cols:
        print("  spark cols:", list(s.columns))
        print("  duck  cols:", list(d.columns))
    return ok_vals


def main():
    spark = build_session("parity-dev", master="local[8]")
    register_testdata_views(spark, SF)
    con = duckdb.connect()
    for t in ("documents", "events", "lineitem", "orders", "customer",
              "nation", "region", "supplier", "part", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    cases = {
        "quality_core": (sqlgen.quality_core_sql(sqlgen.SPARK),
                         sqlgen.quality_core_sql(sqlgen.DUCK)),
        "scrub": (sqlgen.scrub_sql(sqlgen.SPARK), sqlgen.scrub_sql(sqlgen.DUCK)),
    }
    all_ok = True
    for name, (ssql, dsql) in cases.items():
        try:
            sdf = spark.sql(ssql).toPandas()
        except Exception as e:
            print(f"[{name}] SPARK ERROR: {e}")
            all_ok = False
            continue
        try:
            ddf = con.execute(dsql).df()
        except Exception as e:
            print(f"[{name}] DUCK ERROR: {e}")
            all_ok = False
            continue
        all_ok &= compare(name, sdf, ddf)
    spark.stop()
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
