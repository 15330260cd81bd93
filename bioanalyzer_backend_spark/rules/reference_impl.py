"""Pure numpy/pandas twin of the quality-rule battery — the oracle.

This is the "reference labels" generator of the north rule: the Spark
pipeline's keep/drop must match this implementation at F1 >= 0.99
(in practice: exactly), and scrubbed captions must be string-equal.

Semantics are defined by spec.py and mirror the reference engine:
  * per-category scoring        -> methods_scorer.py:114-127
  * weighted rollup             -> methods_scorer.py:77-92
  * status bands (+ quirk)      -> field_validator.py:100-108
  * null sentinels              -> field_validator.py:92-95
  * readiness keep/drop         -> gemini_qa.py:142-153, 657-663
  * scrub chain                 -> text_processing.py:110-125

Float parity notes: every arithmetic expression is written with the SAME
shape and association order as the SQL rendered by sqlgen.py, so IEEE-754
doubles agree bit-for-bit. String parity notes: SQL trim() strips ASCII
spaces ONLY (not tabs) in both Spark and DuckDB — mirrored here with
str.strip(' ').
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .. import spec

_SPLIT = re.compile(spec.TOKEN_SPLIT_RE)
_TOKTRIM = re.compile(spec.TOKEN_TRIM_RE)
_WS_ALL = _SPLIT   # same pattern BY CONSTRUCTION: n_nonspace must strip
# exactly the whitespace class tokenization splits on — two separate
# compiles of the same spec constant invited silent desynchronization
_ALPHA = re.compile(r"[A-Za-z]")
_SCRUB = [(re.compile(p), r) for p, r in spec.SCRUB_CHAIN]
_STOPSET = frozenset(spec.ALL_STOPWORDS)
_SENTINELS = frozenset(s for s in spec.NULL_SENTINELS)


def sql_trim(s: str) -> str:
    """ANSI trim: leading/trailing SPACE characters only."""
    return s.strip(" ")


def tokenize(text: str) -> list[str]:
    """lower(trim) -> ws-split -> punct-trim -> drop empties (sqlgen parity)."""
    t = sql_trim(text).lower()
    toks = _SPLIT.split(t)
    out = []
    for tok in toks:
        tok = _TOKTRIM.sub("", tok)
        if tok:
            out.append(tok)
    return out


def scrub(text: str) -> str:
    """Ordered PII/noise scrub chain; trim at the end (sqlgen.scrub_expr)."""
    e = text
    for pat, repl in _SCRUB:
        e = pat.sub(repl, e)
    return sql_trim(e)


def rule_features(captions: pd.Series) -> pd.DataFrame:
    """Full rule battery -> one row per caption.

    Columns match sqlgen.quality_core_sql output (minus row_id):
    n_chars, score_*, status_*, quality_score, n_present, keep.
    """
    n_rows = len(captions)
    n = np.zeros(n_rows, dtype=np.int64)
    n_tok = np.zeros(n_rows, dtype=np.int64)
    n_utok = np.zeros(n_rows, dtype=np.int64)
    n_stop = np.zeros(n_rows, dtype=np.int64)
    n_alpha = np.zeros(n_rows, dtype=np.int64)
    n_nonspace = np.zeros(n_rows, dtype=np.int64)
    is_sentinel = np.zeros(n_rows, dtype=bool)

    for i, raw in enumerate(captions.astype(object)):
        raw = raw if isinstance(raw, str) else ""
        t = sql_trim(raw)
        n[i] = len(t)
        toks = tokenize(raw)
        n_tok[i] = len(toks)
        n_utok[i] = len(set(toks))
        n_stop[i] = sum(1 for x in toks if x in _STOPSET)
        n_alpha[i] = len(_ALPHA.findall(t))
        n_nonspace[i] = len(_WS_ALL.sub("", t))
        is_sentinel[i] = t.lower() in _SENTINELS or t == ""

    nf = n.astype(np.float64)
    ntf = n_tok.astype(np.float64)

    # score_len — identical piecewise shape/order as the SQL
    score_len = np.where(
        n == 0, 0.0,
        np.where(n < spec.LEN_FULL_LO, (nf / spec.LEN_FULL_LO) * 0.5,
                 np.where(n <= spec.LEN_FULL_HI, 1.0,
                          np.maximum(0.0, 1.0 - (nf - spec.LEN_FULL_HI) / spec.LEN_DECAY))))

    avg_wl = np.divide(n_nonspace.astype(np.float64), ntf,
                       out=np.zeros(n_rows), where=n_tok > 0)
    word_band = (n_tok > 0) & (avg_wl >= spec.WORD_AVG_LEN_LO) & (avg_wl <= spec.WORD_AVG_LEN_HI)
    score_word = np.minimum(1.0, ntf / spec.WORD_TOK_FULL) * np.where(
        word_band, 1.0, spec.WORD_AVG_LEN_PENALTY)

    utok_ratio = np.divide(n_utok.astype(np.float64), ntf,
                           out=np.zeros(n_rows), where=n_tok > 0)
    score_rep = np.where(n_tok == 0, 0.0,
                         np.where(n_tok < spec.REP_MIN_TOKENS, 1.0,
                                  np.minimum(1.0, utok_ratio * spec.REP_BOOST)))

    alpha_ratio = np.divide(n_alpha.astype(np.float64), n_nonspace.astype(np.float64),
                            out=np.zeros(n_rows), where=n_nonspace > 0)
    score_alpha = np.where(n_nonspace == 0, 0.0,
                           np.minimum(1.0, alpha_ratio * spec.ALPHA_BOOST))

    stop_ratio = np.divide(n_stop.astype(np.float64), ntf,
                           out=np.zeros(n_rows), where=n_tok > 0)
    score_stop = np.where(n_tok == 0, 0.0,
                          np.minimum(1.0, spec.STOP_FLOOR + spec.STOP_BOOST * stop_ratio))

    w = spec.RULE_WEIGHTS
    quality = (w["len"] * score_len + w["word"] * score_word
               + w["rep"] * score_rep + w["alpha"] * score_alpha
               + w["stop"] * score_stop)

    def status(s: np.ndarray) -> np.ndarray:
        return np.where(
            s >= spec.PRESENT_MIN, spec.STATUS_PRESENT,
            np.where((s >= spec.PARTIAL_MIN) & (s <= spec.PARTIAL_MAX),
                     spec.STATUS_PARTIAL, spec.STATUS_ABSENT))

    scores = {"len": score_len, "word": score_word, "rep": score_rep,
              "alpha": score_alpha, "stop": score_stop}
    n_present = sum((s >= spec.PRESENT_MIN).astype(np.int32) for s in scores.values())

    keep = ((quality >= spec.KEEP_QUALITY_MIN)
            & (n_present >= spec.KEEP_PRESENT_MIN)
            & (status(score_len) != spec.STATUS_ABSENT)
            & ~is_sentinel
            & (n > 0))

    out = {"n_chars": n}
    for name in spec.RULE_NAMES:
        out[f"score_{name}"] = scores[name]
    for name in spec.RULE_NAMES:
        out[f"status_{name}"] = status(scores[name])
    out["quality_score"] = quality
    out["n_present"] = n_present.astype(np.int32)
    out["keep"] = keep
    return pd.DataFrame(out, index=captions.index)


# re.ASCII aligns \b with the Java/RE2 renderings (ASCII word chars) —
# see the _FALLBACK_MARKERS note; identical on the ASCII corpus, closes
# a unicode-input drift between the three implementations.
_FIELD_PATTERNS = {c: [re.compile(p, re.ASCII) for p in pats]
                   for c, pats in spec.FIELD_PATTERNS.items()}
_CONDITION_PATTERNS = [re.compile(p, re.ASCII)
                       for p in spec.CONDITION_PATTERNS]


def field_confidence(texts: pd.Series) -> pd.DataFrame:
    """Numpy/re twin of sqlgen.field_confidence_sql — the literal
    field_validator.py:121-147 arithmetic: per category n = patterns
    matching the text; conf = min(1, 0.2n+0.6) if a matched pattern also
    hits the content prefix else min(1, 0.1n+0.3); best category wins,
    first category winning ties (strict `>` scan in dict order)."""
    confs, cats = [], []
    for raw in texts.astype(object):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        content = t[:spec.CONTENT_PREFIX_CHARS]
        best_conf, best_cat = 0.0, None
        for cat, pats in _FIELD_PATTERNS.items():
            matched = [p for p in pats if p.search(t)]
            if not matched:
                continue
            n = len(matched)
            if any(p.search(content) for p in matched):
                conf = min(1.0, spec.R2_SAME_CAT_SLOPE * n
                           + spec.R2_SAME_CAT_BASE)
            else:
                conf = min(1.0, spec.R2_CROSS_CAT_SLOPE * n
                           + spec.R2_CROSS_CAT_BASE)
            if conf > best_conf:
                best_conf, best_cat = conf, cat
        confs.append(best_conf)
        cats.append(best_cat)
    return pd.DataFrame({"field_conf": np.asarray(confs, dtype=np.float64),
                         "field_category": cats}, index=texts.index)


def methods_coverage(texts: pd.Series) -> pd.DataFrame:
    """Twin of sqlgen.methods_coverage_sql (methods_scorer.py:114-127):
    score = matched_categories / total_categories, substring matching,
    one hit per category."""
    total = float(len(spec.METHODS_CRITERIA))
    n_matched = []
    for raw in texts.astype(object):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        n_matched.append(sum(
            1 for kws in spec.METHODS_CRITERIA.values()
            if any(k in t for k in kws)))
    n = np.asarray(n_matched, dtype=np.int32)
    return pd.DataFrame({"n_matched": n,
                         "methods_score": n.astype(np.float64) / total},
                        index=texts.index)


def condition_extract(texts: pd.Series) -> pd.Series:
    """Twin of sqlgen.condition_extract_sql (fallback_extractor.py:
    115-133): ordered pattern chain, first capture group of the first
    match wins, None when nothing matches."""
    out = []
    for raw in texts.astype(object):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        hit = None
        for p in _CONDITION_PATTERNS:
            m = p.search(t)
            if m:
                hit = m.group(1)
                break
        out.append(hit)
    return pd.Series(out, index=texts.index, name="condition_hit")


def factor_score(texts: pd.Series) -> pd.DataFrame:
    """Twin of sqlgen.factor_score_sql (gemini_qa.py:218-222):
    min(1, present_factors / MAX_FACTORS)."""
    words = [w for ws in spec.FACTOR_LISTS.values() for w in ws]
    n_factors = []
    for raw in texts.astype(object):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        n_factors.append(sum(1 for w in words if w in t))
    n = np.asarray(n_factors, dtype=np.int32)
    score = np.minimum(1.0, n.astype(np.float64) / float(spec.A5_MAX_FACTORS))
    return pd.DataFrame({"n_factors": n, "factor_score": score},
                        index=texts.index)


def finding_confidence(texts: pd.Series) -> pd.DataFrame:
    """Twin of sqlgen.finding_confidence_sql (gemini_qa.py:35-38):
    0 when no findings, else min(1, 0.3 + 0.15 * n_findings)."""
    n_findings = []
    for raw in texts.astype(object):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        n_findings.append(sum(1 for w in spec.FINDING_MARKERS if w in t))
    n = np.asarray(n_findings, dtype=np.int32)
    conf = np.where(n == 0, 0.0,
                    np.minimum(1.0, spec.A6_CONF_BASE
                               + spec.A6_CONF_PER_FINDING
                               * n.astype(np.float64)))
    return pd.DataFrame({"n_findings": n, "finding_conf": conf},
                        index=texts.index)


def found_terms(texts: pd.Series) -> pd.DataFrame:
    """Twin of sqlgen.found_terms_sql (gemini_qa.py:74-87
    extract_found_terms): per category, the keywords present in the
    text, keyword-list order kept, joined with commas ('' when none)."""
    rows = []
    for raw in texts.astype(object):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        row = {}
        n = 0
        for cat, kws in spec.METHODS_CRITERIA.items():
            hits = [k for k in kws if k in t]
            row[f"found_{cat}"] = ",".join(hits)
            n += len(hits)
        row["n_found"] = n
        rows.append(row)
    out = pd.DataFrame(rows, index=texts.index)
    out["n_found"] = out["n_found"].astype(np.int32)
    return out


# re.ASCII: Python's \b is unicode-aware by default while Java regex
# (Spark) and RE2 (DuckDB) use ASCII word chars — without the flag,
# "éscan" word-bounds differently in the three engines. The spec's
# common-regex-subset rule ([0-9] not \d) left \b as the one remaining
# unicode-semantics hole; ASCII mode closes it for the numpy twin.
_FALLBACK_MARKERS = {f: [re.compile(p, re.ASCII) for p in pats]
                     for f, pats in spec.FALLBACK_FIELD_MARKERS.items()}


def field_fallback(texts: pd.Series) -> pd.DataFrame:
    """Twin of sqlgen.field_fallback_sql (api_utils.py:32-73 default
    field structures; bugsigdb_analyzer.py:147-152 empty-reason rule):
    per field, PRESENT + empty strings when any marker matches, else
    ABSENT + the reference's byte-exact reason/suggestion literals."""
    rows = []
    for raw in texts.astype(object):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        row = {}
        for f, pats in _FALLBACK_MARKERS.items():
            found = any(p.search(t) for p in pats)
            reason, suggest = spec.FALLBACK_FIELDS[f]
            row[f"status_{f}"] = (spec.STATUS_PRESENT if found
                                  else spec.STATUS_ABSENT)
            row[f"reason_{f}"] = "" if found else reason
            row[f"suggest_{f}"] = "" if found else suggest
        rows.append(row)
    return pd.DataFrame(rows, index=texts.index)


def _first_marker(t: str,
                  chain: tuple[tuple[str, str | None], ...]) -> str | None:
    for w, _canon in chain:
        # re.ASCII: see _FALLBACK_MARKERS — \b must be ASCII to match
        # the Java/RE2 renderings of the same chain
        if re.search(r"\b" + w + r"\b", t, re.ASCII):
            return w
    return None


def _normalize(raw: str | None,
               chain: tuple[tuple[str, str | None], ...]) -> str | None:
    """utils.py:87-117 allowed-domain normalization: mapped synonym ->
    canonical value, extracted-but-unmapped -> 'Other', no raw -> None."""
    if raw is None:
        return None
    for w, canon in chain:
        if raw == w and canon is not None:
            return canon
    return "Other"


def domain_normalize(texts: pd.Series) -> pd.DataFrame:
    """Twin of sqlgen.domain_normalize_sql."""
    rows = []
    for raw in texts.astype(object):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        rs = _first_marker(t, spec.SEQ_TYPE_CHAIN)
        rb = _first_marker(t, spec.BODY_SITE_CHAIN)
        rows.append({"raw_seq": rs,
                     "seq_type": _normalize(rs, spec.SEQ_TYPE_CHAIN),
                     "raw_site": rb,
                     "body_site": _normalize(rb, spec.BODY_SITE_CHAIN)})
    return pd.DataFrame(rows, index=texts.index)


def expected_labels(images: pd.DataFrame) -> pd.DataFrame:
    """FIXTURES.md section 2 golden table for an images DataFrame.

    Core-rule labels + scrubbed captions + phash dedup flag
    (canonical = min image_id per phash group, first-occurrence
    semantics of the reference's order-preserving dedup cli.py:1281-1287).
    """
    feats = rule_features(images["caption"])
    feats.insert(0, "image_id", images["image_id"].values)
    feats["scrubbed_caption"] = [scrub(c) for c in images["caption"]]
    canon = images.groupby("phash")["image_id"].transform("min")
    feats["is_dup"] = (images["image_id"] != canon).values
    return feats


def _r11_report(keep: bool, quality: float, n_present: int,
                t: str) -> str:
    """Generate the sectioned report (twin of the g CTE in
    sqlgen.report_parse_sql)."""
    if keep:
        r_line = "READY FOR CURATION"
    elif quality < spec.R11_UNCLEAR_QUALITY_MAX:
        r_line = "STATUS UNCLEAR"
    elif n_present <= spec.R11_NOTREADY_SHORT_MAX:
        r_line = "NOT READY"
    else:
        r_line = "NOT READY FOR CURATION"
    sig = ("yes" if n_present >= spec.R11_SIG_YES_MIN
           else "no" if n_present == 0 else "partial")
    g1 = ", ".join(k for k in spec.FACTOR_LISTS["general"] if k in t)
    g2 = ", ".join(k for k in spec.FACTOR_LISTS["exec"] if k in t)
    conf = int(np.floor(quality * 100.0))
    bullets = "- rule below threshold\n" * (5 - n_present)
    return "\n".join([
        spec.R11_HDR_READINESS, r_line,
        spec.R11_HDR_SIGNATURES,
        f"- Presence of microbial signatures: {sig}",
        spec.R11_HDR_FACTORS,
        f"- General Factors Present: {g1}",
        f"- Environmental Factors Present: {g2}",
        spec.R11_HDR_CONFIDENCE,
        f"Confidence: {conf}",
        spec.R11_HDR_REASONS + "\n" + bullets,
    ])


def _r11_parse(rpt: str) -> dict:
    """Literal line-loop port of the reference parser (gemini_qa.py:
    88-224 parse_enhanced_analysis, subset): section state machine,
    substring precedence (incl. the NOT-READY quirk — gemini_qa.py:
    144-145 matches 'READY FOR CURATION' inside 'NOT READY FOR
    CURATION'), yes/no/partial mapping, first-number confidence regex,
    comma-split factor lists, min(1, n/16) factor score, bullet count."""
    out = {"readiness": "UNKNOWN", "signatures": "Unknown",
           "confidence": 0.0, "n_general": 0, "n_env": 0, "n_reasons": 0}
    section = ""
    for line in rpt.split("\n"):
        line = line.strip()
        if not line:
            continue
        if spec.R11_HDR_READINESS in line:
            section = "readiness"
            continue
        if spec.R11_HDR_SIGNATURES in line:
            section = "signatures"
            continue
        if spec.R11_HDR_FACTORS in line:
            section = "factors"
            continue
        if spec.R11_HDR_CONFIDENCE in line:
            section = "confidence"
            continue
        if spec.R11_HDR_REASONS in line:
            section = "reasons"
            continue
        if section == "readiness":
            lu = line.upper()
            if "READY FOR CURATION" in lu:      # quirk: catches NOT READY
                out["readiness"] = "READY"
            elif "NOT READY" in lu:
                out["readiness"] = "NOT_READY"
            elif "READY" in lu and "NOT" not in lu:
                out["readiness"] = "READY"
            elif "UNKNOWN" in lu or "UNCLEAR" in lu:
                out["readiness"] = "UNKNOWN"
        elif section == "signatures":
            if "Presence of microbial signatures:" in line:
                ll = line.lower()
                if "yes" in ll:
                    out["signatures"] = "Present"
                elif "no" in ll:
                    out["signatures"] = "Absent"
                elif "partial" in ll:
                    out["signatures"] = "Partial"
        elif section == "factors":
            for label, key in (("General Factors Present:", "n_general"),
                               ("Environmental Factors Present:", "n_env")):
                if label in line:
                    payload = line.split(":", 1)[1].strip()
                    out[key] = len([f for f in payload.split(",")
                                    if f.strip()])
        elif section == "confidence":
            m = re.search(r"([0-9]+\.?[0-9]*)", line)
            if m:
                out["confidence"] = float(m.group(1))
        elif section == "reasons":
            if line.startswith("-") or line.startswith("*"):
                out["n_reasons"] += 1
    out["factor_score"] = min(1.0, (out["n_general"] + out["n_env"]) / 16.0)
    return out


def report_parse(texts: pd.Series) -> pd.DataFrame:
    """Twin of sqlgen.report_parse_sql: generate each doc's sectioned
    report from its rule columns, parse it back with the literal
    reference rules."""
    feats = rule_features(texts)
    rows = []
    for i, raw in enumerate(texts.astype(object)):
        t = sql_trim(raw if isinstance(raw, str) else "").lower()
        rpt = _r11_report(bool(feats["keep"].iloc[i]),
                          float(feats["quality_score"].iloc[i]),
                          int(feats["n_present"].iloc[i]), t)
        rows.append(_r11_parse(rpt))
    out = pd.DataFrame(rows, index=texts.index)
    for c in ("n_general", "n_env", "n_reasons"):
        out[c] = out[c].astype(np.int32)
    return out[["readiness", "signatures", "confidence", "n_general",
                "n_env", "factor_score", "n_reasons"]]
