"""Real-Iceberg runtime smoke (gated: `pytest -m iceberg`).

The snapshot-table API (sources/catalog.py) is developed and tested
against the LocalSnapshotTable parquet fallback because this sandbox
cannot fetch `iceberg-spark-runtime` (SURVEY.md section 7). This module
exercises the SAME keyed-upsert / delete / snapshot semantics against a
real Iceberg hadoop catalog WHEN the runtime jar is present — so any
environment that can `--packages org.apache.iceberg:iceberg-spark-runtime-*`
gets the fallback-vs-real equivalence checked by running
`python -m pytest -m iceberg`. Without the jar every test here skips
(it is also excluded from the default `-m "not iceberg"` run).
"""

import glob
import os

import pytest

from bioanalyzer_backend_spark.sources.catalog import IcebergTable


def _iceberg_jar_present() -> bool:
    roots = []
    try:
        import pyspark
        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    for extra in os.environ.get("ICEBERG_JARS", "").split(os.pathsep):
        if extra:
            roots.append(os.path.dirname(extra) or ".")
    return any(glob.glob(os.path.join(r, "*iceberg-spark-runtime*.jar"))
               for r in roots)


pytestmark = [
    pytest.mark.iceberg,
    pytest.mark.skipif(not _iceberg_jar_present(),
                       reason="iceberg-spark-runtime jar not on the "
                              "classpath (expected in this sandbox; see "
                              "SURVEY.md section 7)"),
]


@pytest.fixture()
def iceberg_catalog(spark, tmp_path):
    """Configure a hadoop-type Iceberg catalog on the session (catalog
    plugins instantiate lazily on first reference, so runtime conf works)."""
    spark.conf.set("spark.sql.catalog.ice",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse",
                   str(tmp_path / "warehouse"))
    yield "ice"


def test_append_merge_delete_roundtrip(spark, iceberg_catalog):
    ident = f"{iceberg_catalog}.db.t_smoke"
    spark.sql(f"CREATE TABLE {ident} (k INT, v STRING) USING iceberg")
    tbl = IcebergTable(ident)
    tbl.append(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    tbl.merge_by_key(
        spark, spark.createDataFrame([(2, "B"), (3, "C")], "k int, v string"),
        "k")
    got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "C"}
    tbl.delete_where(spark, "k = 1")
    assert sorted(r["k"] for r in tbl.read(spark).collect()) == [2, 3]


def test_delete_where_keeps_null_predicate_rows(spark, iceberg_catalog):
    """The NULL-predicate DELETE semantics the fallback implements by
    hand are Iceberg's native behavior — assert they agree."""
    ident = f"{iceberg_catalog}.db.t_null"
    spark.sql(f"CREATE TABLE {ident} (g INT, v STRING) USING iceberg")
    tbl = IcebergTable(ident)
    tbl.append(spark.createDataFrame(
        [(3, "stamped"), (None, "lineage"), (4, "other")],
        "g int, v string"))
    tbl.delete_where(spark, "g = 3")
    got = sorted(((r["g"], r["v"]) for r in tbl.read(spark).collect()),
                 key=str)
    assert got == [(4, "other"), (None, "lineage")]
