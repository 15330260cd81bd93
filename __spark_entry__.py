"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``bioanalyzer_backend_spark``; the registry in
``plans/catalog_queries.py`` renders every SQL-expressible operator to
BOTH dialects from one source (sqlgen), so Spark and oracle cannot drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bioanalyzer_backend_spark.plans.catalog_queries import registry  # noqa: E402

_REG = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full quality-filter pipeline (core rules + scrub +
    langid/perplexity UDF gates) over the sf0.001 documents table."""
    from bioanalyzer_backend_spark.plans import pipeline as P
    from bioanalyzer_backend_spark.session import register_testdata_views

    sf_dir = "/root/testdata/sf0.001"
    P.ensure_artifacts()
    register_testdata_views(spark, sf_dir)
    df = spark.table("documents").withColumnRenamed("text", "caption")
    out = P.quality_filter(df.select("doc_id", "caption"),
                           with_dedup=False)
    return out.select("doc_id", "lang", "lang_conf", "ppl", "quality_score",
                      "n_present", "keep_core", "keep", "scrubbed_caption")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _REG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _REG.items() if sql is not None}
