"""Bucketed-layout evidence: aggs and joins on the bucket key plan with NO
shuffle Exchange (the 100 TB design point for phash dedup / checkpoint
joins — see sources/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from bioanalyzer_backend_spark.sources import bucketing


@pytest.fixture(scope="module")
def bucketed_pair(spark, synth_images_df, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    slim = synth_images_df.select("image_id", "phash")
    bucketing.write_bucketed(slim, "bk_a", "phash", 8, str(base / "a"))
    bucketing.write_bucketed(slim.withColumnRenamed("image_id", "other_id"),
                             "bk_b", "phash", 8, str(base / "b"))
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


@pytest.fixture()
def no_aqe_no_broadcast(spark):
    """Static plans for assertion stability; SMJ forced over broadcast."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair,
                                      no_aqe_no_broadcast):
    a, _ = bucketed_pair
    agg = (spark.table(a).groupBy("phash")
           .agg(F.min("image_id").alias("canon")))
    assert not bucketing.plan_has_exchange(agg)
    assert agg.count() > 0


def test_unbucketed_agg_has_exchange(spark, synth_images_df,
                                     no_aqe_no_broadcast):
    agg = (synth_images_df.select("image_id", "phash").groupBy("phash")
           .agg(F.min("image_id").alias("canon")))
    assert bucketing.plan_has_exchange(agg)


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair,
                                         no_aqe_no_broadcast):
    a, b = bucketed_pair
    joined = spark.table(a).join(spark.table(b), "phash")
    assert not bucketing.plan_has_exchange(joined)
    assert joined.count() > 0


def test_plan_probe_sees_join_child_exchanges(spark, synth_images_df,
                                              no_aqe_no_broadcast):
    """The Exchange probe must see shuffle nodes in NON-LAST join
    children (printed with a ':' tree prefix) and ReusedExchange — a
    previous version stripped only '+-* ', so an unbucketed sort-merge
    join read as exchange-free and the no-shuffle assertions could never
    fail."""
    slim = synth_images_df.select("image_id", "phash")
    other = slim.withColumnRenamed("image_id", "other_id")
    joined = slim.join(other, "phash")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert any(line.lstrip().startswith(":") for line in plan.splitlines())
    assert bucketing.plan_has_exchange(joined)


def test_cobucketed_join_matches_plain_join(spark, bucketed_pair,
                                            synth_images_df):
    a, b = bucketed_pair
    got = spark.table(a).join(spark.table(b), "phash").count()
    slim = synth_images_df.select("image_id", "phash")
    want = slim.join(slim.withColumnRenamed("image_id", "other_id"),
                     "phash").count()
    assert got == want
