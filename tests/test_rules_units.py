"""Unit tests per operator family (SURVEY.md section 5.3-5.4).

Status-band edges (including the reference's (0.7,0.8)->ABSENT quirk from
field_validator.py:100-108), scrub idempotence/unicode properties,
tokenizer semantics, codec round-trips, phash stability.
"""

import numpy as np
import pandas as pd
import pytest

from bioanalyzer_backend_spark import spec
from bioanalyzer_backend_spark.datagen.imgcodec import (decode_bmp, decode_ppm,
                                                        encode_bmp, encode_ppm,
                                                        psnr)
from bioanalyzer_backend_spark.functions.phash import average_hash
from bioanalyzer_backend_spark.rules import reference_impl as ri


# --------------------------------------------------------------------------
# status banding — the quirk is load-bearing
# --------------------------------------------------------------------------

def _status_of(score: float) -> str:
    df = ri.rule_features(pd.Series(["x"]))  # shape probe
    # reimplement the band exactly as spec'd for a scalar
    if score >= spec.PRESENT_MIN:
        return spec.STATUS_PRESENT
    if spec.PARTIAL_MIN <= score <= spec.PARTIAL_MAX:
        return spec.STATUS_PARTIAL
    return spec.STATUS_ABSENT


@pytest.mark.parametrize("score,expected", [
    (0.0, "ABSENT"), (0.39, "ABSENT"),
    (0.4, "PARTIALLY_PRESENT"), (0.55, "PARTIALLY_PRESENT"),
    (0.7, "PARTIALLY_PRESENT"),
    (0.75, "ABSENT"),          # the reference quirk: (0.7, 0.8) -> ABSENT
    (0.79, "ABSENT"),
    (0.8, "PRESENT"), (1.0, "PRESENT"),
])
def test_status_bands(score, expected):
    assert _status_of(score) == expected


def test_band_quirk_in_spark(spark):
    """The (0.7,0.8)->ABSENT quirk must survive the Spark rendering."""
    from bioanalyzer_backend_spark import sqlgen
    rows = spark.sql(
        "SELECT " + sqlgen._status_case("0.75") + " AS s").collect()
    assert rows[0]["s"] == "ABSENT"


# --------------------------------------------------------------------------
# scrub properties
# --------------------------------------------------------------------------

SCRUB_CASES = [
    ("contact john.doe@example.com now", "<EMAIL>"),
    ("visit https://ex.com/a?b=1 ok", "<URL>"),
    ("www.pics.example.net rocks", "<URL>"),
    ("ssn 123-45-6789 leaked", "<ID>"),
    ("call +1 (555) 123-4567 now", "<PHONE>"),
    ("cited [1, 2] here", "cited here"),
    ("shown (Figure 3) fine", "shown fine"),
]


@pytest.mark.parametrize("text,frag", SCRUB_CASES)
def test_scrub_hits(text, frag):
    assert frag in ri.scrub(text)


@pytest.mark.parametrize("text", [
    "", "   ", "plain caption with no pii at all",
    "a@b.co and +44 20 7946 0958 and [3] and https://x.y",
    "emoji \U0001F600 caption", "مدينة rtl text",
    "café ümläut", "这是一张照片",
])
def test_scrub_idempotent(text):
    once = ri.scrub(text)
    assert ri.scrub(once) == once


def test_scrub_matches_spark(spark):
    from bioanalyzer_backend_spark import sqlgen
    texts = [t for t, _ in SCRUB_CASES] + [
        "multi john@a.io jane@b.io +1 555 123 4567 123-45-6789 "
        "https://a.b [1] (Table 2) end"]
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    out = sdf.selectExpr(
        "i", sqlgen.scrub_expr("text", sqlgen.SPARK) + " AS s"
    ).toPandas().sort_values("i")
    expected = [ri.scrub(t) for t in texts]
    assert out["s"].tolist() == expected


# --------------------------------------------------------------------------
# tokenizer semantics (SQL-parity critical)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("text,toks", [
    ("", []),
    ("   ", []),
    (" \t ", []),
    ("Hello, World!", ["hello", "world"]),
    ("a  b\tc\nd", ["a", "b", "c", "d"]),
    ("--x-- ''y''", ["x", "y"]),
    ("123 45a", ["123", "45a"]),
    ("这是", []),             # non-ASCII tokens strip to empty
])
def test_tokenize(text, toks):
    assert ri.tokenize(text) == toks


def test_sql_trim_is_space_only():
    assert ri.sql_trim(" \tx ") == "\tx"


# --------------------------------------------------------------------------
# codecs + phash
# --------------------------------------------------------------------------

def test_bmp_roundtrip():
    rng = np.random.default_rng(0)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_ppm_roundtrip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_psnr_lossy_quantization():
    """6-bit quantization stays above the 40 dB gate; 3-bit falls below."""
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    q6 = (px & ~np.uint8(3))
    q3 = (px & ~np.uint8(31))
    assert psnr(px, px) == float("inf")
    assert psnr(px, q6) >= 40.0
    assert psnr(px, q3) < 40.0


def test_phash_stable_and_noise_invariant():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    h1 = average_hash(px)
    assert h1 == average_hash(px.copy())
    assert isinstance(h1, int)
    assert -(1 << 63) <= h1 < (1 << 63)


# --------------------------------------------------------------------------
# Literal reference-formula scorers (R2/A1/R6/A5/A6): numpy twin vs the
# DuckDB-rendered SQL — closes the three-implementation triangle (the
# Spark side is covered by test_oracle_parity's registry sweep).
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def _docs_duck():
    import duckdb

    from .conftest import SF001
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS "
                f"SELECT * FROM '{SF001}/documents.parquet'")
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id").df()
    return con, docs


def _duck_by_id(con, sql):
    return (con.execute(sql).df().sort_values("row_id")
            .reset_index(drop=True))


def test_field_confidence_numpy_vs_sql(_docs_duck):
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _docs_duck
    got = _duck_by_id(con, sqlgen.field_confidence_sql(sqlgen.DUCK))
    exp = ri.field_confidence(docs["text"])
    assert np.array_equal(got["field_conf"].to_numpy(),
                          exp["field_conf"].to_numpy())
    assert [c if pd.notna(c) else None for c in got["field_category"]] \
        == list(exp["field_category"])
    # distribution sanity: both branches of the formula fire on the corpus
    assert (exp["field_conf"] >= 0.6).any()          # same-category branch
    assert exp["field_category"].notna().any()


def test_methods_coverage_numpy_vs_sql(_docs_duck):
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _docs_duck
    got = _duck_by_id(con, sqlgen.methods_coverage_sql(sqlgen.DUCK))
    exp = ri.methods_coverage(docs["text"])
    assert np.array_equal(got["n_matched"].to_numpy(),
                          exp["n_matched"].to_numpy())
    assert np.array_equal(got["methods_score"].to_numpy(),
                          exp["methods_score"].to_numpy())
    assert got["n_matched"].nunique() > 1            # not degenerate


def test_condition_extract_numpy_vs_sql(_docs_duck):
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _docs_duck
    got = _duck_by_id(con, sqlgen.condition_extract_sql(sqlgen.DUCK))
    exp = ri.condition_extract(docs["text"])
    assert [c if pd.notna(c) else None for c in got["condition_hit"]] \
        == list(exp)
    assert exp.notna().any()                         # chain fires somewhere


def test_factor_and_finding_numpy_vs_sql(_docs_duck):
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _docs_duck
    got_f = _duck_by_id(con, sqlgen.factor_score_sql(sqlgen.DUCK))
    exp_f = ri.factor_score(docs["text"])
    assert np.array_equal(got_f["factor_score"].to_numpy(),
                          exp_f["factor_score"].to_numpy())
    got_c = _duck_by_id(con, sqlgen.finding_confidence_sql(sqlgen.DUCK))
    exp_c = ri.finding_confidence(docs["text"])
    assert np.array_equal(got_c["finding_conf"].to_numpy(),
                          exp_c["finding_conf"].to_numpy())
    # the zero-findings guard (conf 0, not 0.3) is reachable
    assert ((exp_c["n_findings"] == 0) == (exp_c["finding_conf"] == 0.0)).all()


def test_found_terms_numpy_vs_sql(_docs_duck):
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _docs_duck
    got = _duck_by_id(con, sqlgen.found_terms_sql(sqlgen.DUCK))
    exp = ri.found_terms(docs["text"])
    for col in exp.columns:
        assert list(got[col]) == list(exp[col]), col
    # order preserved from the keyword list, not text order
    assert (got["n_found"] > 0).any() and (got["n_found"] == 0).sum() >= 0


def test_report_parse_numpy_vs_sql(_docs_duck):
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _docs_duck
    got = _duck_by_id(con, sqlgen.report_parse_sql(sqlgen.DUCK))
    exp = ri.report_parse(docs["text"])
    for col in exp.columns:
        assert list(got[col]) == list(exp[col]), col


def test_report_parser_branches_and_quirk():
    """The literal R11 parser branches, including the reference's
    substring-precedence quirk (gemini_qa.py:144-145): a
    'NOT READY FOR CURATION' line contains 'READY FOR CURATION', so the
    FIRST branch wins and it parses as READY; only the bare 'NOT READY'
    form reaches the NOT_READY branch."""
    mk = ri._r11_parse
    base = ("CURATION READINESS ASSESSMENT:\n{r}\n"
            "MICROBIAL SIGNATURE ANALYSIS:\n"
            "- Presence of microbial signatures: {s}\n"
            "FACTOR-BASED ANALYSIS:\n"
            "- General Factors Present: {g}\n"
            "- Environmental Factors Present: \n"
            "CONFIDENCE LEVEL:\nConfidence: {c}\n"
            "SPECIFIC REASONS FOR DECISION:\n{b}")
    quirk = mk(base.format(r="NOT READY FOR CURATION", s="yes",
                           g="table, scan", c="75", b=""))
    assert quirk["readiness"] == "READY"          # the quirk, ported
    assert quirk["signatures"] == "Present"
    assert quirk["confidence"] == 75.0
    assert quirk["n_general"] == 2 and quirk["n_env"] == 0
    short = mk(base.format(r="NOT READY", s="no", g="", c="0",
                           b="- a\n- b\n- c"))
    assert short["readiness"] == "NOT_READY"      # bare form reaches it
    assert short["signatures"] == "Absent"
    assert short["n_reasons"] == 3
    unclear = mk(base.format(r="STATUS UNCLEAR", s="partial", g="table",
                             c="12.5", b=""))
    assert unclear["readiness"] == "UNKNOWN"
    assert unclear["signatures"] == "Partial"
    assert unclear["confidence"] == 12.5
    assert unclear["factor_score"] == 1 / 16


def test_field_fallback_numpy_vs_sql(_docs_duck):
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _docs_duck
    got = _duck_by_id(con, sqlgen.field_fallback_sql(sqlgen.DUCK))
    exp = ri.field_fallback(docs["text"])
    for col in exp.columns:
        assert list(got[col]) == list(exp[col]), col
    # both arms fire on the corpus for the marker-backed fields ...
    for f in ("host_species", "body_site", "condition",
              "sequencing_type", "taxa_level"):
        vals = set(exp[f"status_{f}"])
        assert vals == {"PRESENT", "ABSENT"}, f
    # ... and sample_size keeps real number semantics: the synthetic
    # corpus is digit-free, so it exercises the always-ABSENT arm with
    # the reference literal on every row
    assert set(exp["status_sample_size"]) == {"ABSENT"}
    assert set(exp["reason_sample_size"]) == {
        "No sample size information found in the paper"}


def test_fallback_literals_byte_exact():
    """The reason/suggestion strings must stay byte-equal to
    api_utils.py:32-73 create_default_field_structure — pinned here
    verbatim so a spec.py edit cannot silently drift them."""
    assert spec.FALLBACK_FIELDS["host_species"] == (
        "No host species information found in the paper",
        "Look for mentions of human, mouse, rat, or other study organisms")
    assert spec.FALLBACK_FIELDS["sequencing_type"] == (
        "No sequencing type information found in the paper",
        "Look for mentions of 16S, metagenomics, or other sequencing "
        "methods")
    assert spec.FALLBACK_FIELDS["taxa_level"] == (
        "No taxonomic level information found in the paper",
        "Look for mentions of phylum, genus, species, or other taxonomic "
        "levels")
    assert set(spec.FALLBACK_FIELDS) == {
        "host_species", "body_site", "condition", "sequencing_type",
        "taxa_level", "sample_size"}
    # a non-missing field reports EMPTY reason (bugsigdb_analyzer.py:151)
    got = ri.field_fallback(pd.Series(["customer row scan group"]))
    assert got.loc[0, "status_host_species"] == "PRESENT"
    assert got.loc[0, "reason_host_species"] == ""
    assert got.loc[0, "suggest_host_species"] == ""


def test_domain_normalize_numpy_vs_sql(_docs_duck):
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _docs_duck
    got = _duck_by_id(con, sqlgen.domain_normalize_sql(sqlgen.DUCK))
    exp = ri.domain_normalize(docs["text"])
    for col in exp.columns:
        assert [v if pd.notna(v) else None for v in got[col]] \
            == [v if v is not None else None for v in exp[col]], col
    # every normalized value lands INSIDE the reference enumeration
    seq = {v for v in exp["seq_type"] if v is not None}
    site = {v for v in exp["body_site"] if v is not None}
    assert seq <= set(spec.SEQUENCING_TYPES)
    assert site <= set(spec.BODY_SITES)
    # all three arms are exercised: mapped synonyms and the Other
    # catch-all on the corpus, the NULL no-extraction arm on a
    # constructed marker-free document
    assert "Other" in seq and len(seq) >= 3
    assert "Other" in site and len(site) >= 3
    null_arm = ri.domain_normalize(pd.Series(["zzz unmarked text"]))
    assert null_arm.loc[0, "seq_type"] is None
    assert null_arm.loc[0, "body_site"] is None


def test_domain_enumerations_byte_exact():
    """utils.py:87-117 get_sequencing_types / get_body_sites, verbatim."""
    assert spec.SEQUENCING_TYPES == (
        "16S rRNA", "Shotgun metagenomics", "Metatranscriptomics", "ITS",
        "Other amplicon", "Culture-based", "Other")
    assert spec.BODY_SITES == (
        "Gut", "Oral", "Skin", "Respiratory tract", "Urogenital", "Blood",
        "Other")
    # every chain target is a member of its enumeration
    for _w, canon in spec.SEQ_TYPE_CHAIN:
        assert canon is None or canon in spec.SEQUENCING_TYPES
    for _w, canon in spec.BODY_SITE_CHAIN:
        assert canon is None or canon in spec.BODY_SITES


def test_null_text_matches_numpy_oracle():
    """A NULL text must behave exactly like '' across the whole rule
    surface (the numpy oracle fillna's None -> ''): bare SQL NULL would
    propagate into LEAST/GREATEST — which SKIP NULL args in both
    engines — silently scoring a NULL document 1.0 on three rules and
    parsing its report as READY (empirically confirmed pre-fix). The
    shipped testdata has no NULLs, so this regression test is the only
    guard for arbitrary crawl inputs."""
    import duckdb

    from bioanalyzer_backend_spark import sqlgen
    con = duckdb.connect()
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [None, "", "key agg row scan slow"]})
    con.register("documents", df)

    got = (con.execute(sqlgen.quality_core_sql(sqlgen.DUCK)).df()
           .sort_values("row_id").reset_index(drop=True))
    exp = ri.rule_features(df["text"])
    for col in ("score_len", "score_word", "score_rep", "score_alpha",
                "score_stop", "quality_score"):
        assert np.array_equal(got[col].to_numpy(),
                              exp[col].to_numpy()), col
    assert list(got["n_present"]) == list(exp["n_present"])
    assert bool(got.loc[0, "keep"]) is False            # NULL == '' arm
    assert got.loc[0, "n_chars"] == 0
    assert got.loc[0, "quality_score"] == 0.0

    for sql_fn, np_fn, key in (
            (sqlgen.field_confidence_sql, ri.field_confidence,
             "field_conf"),
            (sqlgen.factor_score_sql, ri.factor_score, "factor_score"),
            (sqlgen.finding_confidence_sql, ri.finding_confidence,
             "finding_conf")):
        g = (con.execute(sql_fn(sqlgen.DUCK)).df()
             .sort_values("row_id").reset_index(drop=True))
        e = np_fn(df["text"])
        assert np.array_equal(g[key].to_numpy(), e[key].to_numpy()), key
        assert g.loc[0, key] == 0.0, key                # NULL row scores 0

    rp = (con.execute(sqlgen.report_parse_sql(sqlgen.DUCK)).df()
          .sort_values("row_id").reset_index(drop=True))
    assert rp.loc[0, "readiness"] != "READY"            # never READY on NULL
    # scrub: NULL -> '' like the numpy fillna twin, not NULL
    sc = (con.execute(sqlgen.scrub_sql(sqlgen.DUCK)).df()
          .sort_values("row_id").reset_index(drop=True))
    assert sc.loc[0, "scrubbed"] == ""


# --------------------------------------------------------------------------
# oracle-binding meta-tests (round-5 verdict item 6): a deliberately
# mutated reference literal in the RENDERED SQL must be caught by the
# numpy-twin value compare. Both dialects render from one spec constant,
# so a spec-level mutation drifts both SQL sides together by design —
# the numpy twin is the layer that binds, and these tests prove it does
# (i.e. the compared columns actually carry the ported literals).
# --------------------------------------------------------------------------

def _duck_docs(rows):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con, con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id").df()


def test_mutated_fallback_literal_is_caught():
    from bioanalyzer_backend_spark import sqlgen
    con, docs = _duck_docs([(0, "human gut study"), (1, "nothing here")])
    sql = sqlgen.field_fallback_sql(sqlgen.DUCK)
    lit = spec.FALLBACK_FIELDS["condition"][1]   # the suggestions literal
    assert sql.count(lit) == 1
    exp = ri.field_fallback(docs["text"])
    good = _duck_by_id(con, sql)
    assert list(good["suggest_condition"]) == list(exp["suggest_condition"])
    bad = _duck_by_id(con, sql.replace(lit, lit.upper()))
    assert list(bad["suggest_condition"]) != list(exp["suggest_condition"])


def test_mutated_domain_enum_is_caught():
    from bioanalyzer_backend_spark import sqlgen
    # 'hash' is an extracted-but-unmapped marker -> the 'Other' collapse
    # arm fires; 'scan' maps into the enumeration -> pass-through arm.
    con, docs = _duck_docs([(0, "hash partitioned rows"),
                            (1, "scan the gut table")])
    sql = sqlgen.domain_normalize_sql(sqlgen.DUCK)
    exp = ri.domain_normalize(docs["text"])
    good = _duck_by_id(con, sql)
    assert list(good["seq_type"]) == list(exp["seq_type"])
    bad = _duck_by_id(con, sql.replace("'Other'", "'other'"))
    assert list(bad["seq_type"]) != list(exp["seq_type"])
    bad2 = _duck_by_id(con, sql.replace("'16S rRNA'", "'16s rrna'"))
    assert list(bad2["seq_type"]) != list(exp["seq_type"])


def test_mutated_cache_search_order_is_caught():
    """cache_search has no numpy twin; its binding layer is the Spark-vs-
    DuckDB hash compare on a TOTAL order. Prove the compare is sensitive
    to the newest-first semantics (cache_manager.py:409/:415): flipping
    ts DESC to ASC in one dialect's rendering changes the LIMIT cut."""
    import duckdb

    from bioanalyzer_backend_spark.plans.catalog_queries import (DUCK,
                                                                 _q_cache_search)
    from .conftest import SF001
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{SF001}/{t}.parquet'")
    sql = _q_cache_search(DUCK)
    assert sql.count("ORDER BY ts_us DESC") == 1
    good = con.execute(sql).df()
    bad = con.execute(sql.replace("ORDER BY ts_us DESC",
                                  "ORDER BY ts_us ASC")).df()
    assert len(good) == len(bad)                 # same LIMIT ...
    assert not good["hit_id"].equals(bad["hit_id"])   # ... different cut
