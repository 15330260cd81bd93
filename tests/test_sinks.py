"""Sink tests — SURVEY.md section 2.1 K1/K2/K4/K5 analogues.

The reference emits JSON/CSV(wide pivot)/XML/table/per-record files
(cli.py:553-796, 982-999); here the same shapes are plain DataFrame
writers: keeping rule columns COLUMNAR makes the reference's 17-column
CSV pivot a projection, and its per-record file sink a partitionBy write.
"""

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from bioanalyzer_backend_spark.plans import pipeline as P


def _result(spark, synth_images_df):
    out = P.quality_filter(synth_images_df.limit(300), with_dedup=False)
    return out.drop("bytes")


def test_csv_wide_pivot_sink(spark, synth_images_df, tmp_path):
    out = _result(spark, synth_images_df)
    # K2: nested fields -> flat columns is just a select (columnar rules)
    wide = out.select("image_id", "quality_score", "n_present", "keep",
                      *[f"score_{r}" for r in
                        ("len", "word", "rep", "alpha", "stop")],
                      *[f"status_{r}" for r in
                        ("len", "word", "rep", "alpha", "stop")])
    path = str(tmp_path / "csv")
    wide.write.option("header", True).csv(path)
    back = pd.concat([pd.read_csv(f) for f in glob.glob(path + "/*.csv")])
    assert len(back) == wide.count()
    assert list(back.columns) == wide.columns


def test_json_sink_roundtrip(spark, synth_images_df, tmp_path):
    out = _result(spark, synth_images_df).select(
        "image_id", "keep", "quality_score", "scrubbed_caption")
    path = str(tmp_path / "json")
    out.write.json(path)
    back = spark.read.json(path)
    assert back.count() == out.count()
    assert set(back.columns) == set(out.columns)


def test_partitioned_sink_by_keep_lang(spark, synth_images_df, tmp_path):
    # K5: per-record file sink -> partitioned parquet by (keep, lang)
    out = _result(spark, synth_images_df).select(
        "image_id", "lang", "keep", "quality_score")
    path = str(tmp_path / "part")
    out.write.partitionBy("keep", "lang").parquet(path)
    dirs = glob.glob(path + "/keep=*/lang=*")
    assert len(dirs) >= 2
    back = spark.read.parquet(path)
    assert back.count() == out.count()
    # partition pruning: reading one keep= branch scans only that subtree
    kept = spark.read.parquet(path).where(F.col("keep") == True)  # noqa: E712
    assert kept.count() == out.where("keep").count()


def test_xml_sink_roundtrip(spark, synth_images_df, tmp_path):
    # K3: XML emitter (cli.py:651-695) — native-expression element strings
    import xml.etree.ElementTree as ET

    from bioanalyzer_backend_spark.plans import sinks

    out = _result(spark, synth_images_df).select(
        "image_id", "keep", "quality_score", "scrubbed_caption")
    path = str(tmp_path / "xml")
    sinks.write_xml(out, path, row_tag="paper")

    lines = []
    for f in glob.glob(path + "/part-*"):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == out.count()
    # every line parses standalone and fields round-trip (incl. CDATA text)
    want = {r["image_id"]: r for r in
            (row.asDict() for row in out.collect())}
    for ln in lines:
        el = ET.fromstring(ln)
        assert el.tag == "paper"
        w = want[el.find("image_id").text]
        assert el.find("scrubbed_caption").text == (
            w["scrubbed_caption"] if w["scrubbed_caption"] != "" else None)
        assert el.find("keep").text == str(w["keep"]).lower()


def test_xml_escaping_adversarial(spark):
    import xml.etree.ElementTree as ET

    from bioanalyzer_backend_spark.plans import sinks

    evil = 'a <b> & "c" ]]> done'
    df = spark.createDataFrame(
        [("x1", evil, evil)], "image_id string, free string, cap string")
    rooted = sinks.rooted_xml_string(df, cdata_cols=("cap",))
    root = ET.fromstring(rooted)
    el = root.find("record")
    assert el.find("free").text == evil      # escaped path round-trips
    assert el.find("cap").text == evil       # split-CDATA path round-trips


def test_xml_rejects_invalid_tag_names(spark):
    import pytest as _pytest

    from bioanalyzer_backend_spark.plans import sinks
    df = spark.createDataFrame([(1, "x")], ["ok", "2bad"])
    with _pytest.raises(ValueError, match="XML tag"):
        sinks.xml_element(df)
    with _pytest.raises(ValueError, match="XML tag"):
        sinks.xml_element(df.select("ok"), row_tag="a b")
    # valid subset passes
    assert sinks.xml_element(df, cols=["ok"]).select("xml").count() == 1
