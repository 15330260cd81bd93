"""Deep duck-vs-numpy fuzz of the rule twins (beyond the committed
hypothesis budgets): marker-dense random captions — rule keywords,
sentinels, PII fragments, numerics, punctuation runs, whitespace junk —
compared value-exactly across six twin families (core battery, scrub,
field fallback, domain normalize, threshold sweep, discrete quantiles).
The compare idioms mirror tests/test_properties.py's duck-vs-numpy
tests (kept self-contained here — scripts must not import from tests/);
if the NULL-canonicalization idiom changes there, change it here too.

One-off evidence harness, not part of the pytest suite (runtime scales
with --batches); round-5 runs: 60x200 and 300x200 (60k captions incl.
300 NULL rows), plus a final 120x200 at seed 20260819 on the shipped
code — zero mismatches.

Run:  python scripts/deep_fuzz.py [--batches 60] [--rows 200]
Exits 1 on any mismatch.
"""
import argparse
import math
import os
import random
import string
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioanalyzer_backend_spark import sqlgen  # noqa: E402
from bioanalyzer_backend_spark.plans.catalog_queries import (  # noqa: E402
    _q_score_quantiles, _q_threshold_sweep)
from bioanalyzer_backend_spark.rules import reference_impl as ri  # noqa: E402
from bioanalyzer_backend_spark.sqlgen import DUCK  # noqa: E402

# Rule-relevant fragments: every marker family the spec keys on, plus
# PII shapes the scrub chain targets and sentinel/junk shapes the
# pipeline's edge rows exercise.
MARKERS = [
    "16s", "rrna", "shotgun", "metagenomic", "amplicon", "wgs", "gut",
    "stool", "human", "mouse", "n =", "n=", "p <", "cohort", "methods",
    "sequencing", "study", "patients", "abundance", "doi:", "fig.",
    "http://x.co/a", "john@x.com", "555-123-4567", "condition:", "unknown",
    "n/a", "not specified", "scan", "hash", "READY", "NOT READY",
]
PUNCT = [".", ",", "!", "(", ")", "-", "'", '"', ":", ";", "%"]


def rand_caption(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(0, 40)):
        r = rng.random()
        if r < 0.35:
            parts.append(rng.choice(MARKERS))
        elif r < 0.7:
            parts.append("".join(rng.choice(string.ascii_lowercase)
                                 for _ in range(rng.randint(1, 8))))
        elif r < 0.8:
            parts.append(str(rng.randint(0, 99999)))
        elif r < 0.9:
            parts.append(rng.choice(PUNCT))
        else:
            parts.append(rng.choice(["  ", "\t", ""]))
    return " ".join(parts)[:400]


def run(batches: int, rows: int, seed: int = 20260818) -> int:
    rng = random.Random(seed)
    fails = 0
    con = duckdb.connect()          # ONE connection; re-registered per batch
    for batch in range(batches):
        caps = [rand_caption(rng) for _ in range(rows)]
        caps[0] = ""                      # always include the empty row
        if rows > 1:
            caps[1] = None                # and a NULL row: the pinned
            # NULL-text=='' invariant must hold on every twin family
        df = pd.DataFrame({
            "doc_id": range(len(caps)), "text": caps,
            "lang": [["en", "es", "de", "fr", "zz"][i % 5]
                     for i in range(len(caps))]})
        con.register("documents", df)

        got = (con.execute(sqlgen.quality_core_sql(DUCK)).df()
               .sort_values("row_id").reset_index(drop=True))
        exp = ri.rule_features(df["text"])
        for col in ("quality_score", "n_present", "keep"):
            if not np.array_equal(got[col].to_numpy(),
                                  exp[col].to_numpy()):
                print(f"CORE MISMATCH batch={batch} col={col}")
                fails += 1

        sc = (con.execute(sqlgen.scrub_sql(DUCK)).df()
              .sort_values("row_id").reset_index(drop=True))
        if list(sc["scrubbed"]) != [ri.scrub(c if c is not None else "")
                                    for c in caps]:
            print(f"SCRUB MISMATCH batch={batch}")
            fails += 1

        fb = (con.execute(sqlgen.field_fallback_sql(DUCK)).df()
              .sort_values("row_id").reset_index(drop=True))
        fe = ri.field_fallback(df["text"])
        for col in fe.columns:
            if list(fb[col]) != list(fe[col]):
                print(f"FALLBACK MISMATCH batch={batch} col={col}")
                fails += 1

        dn = (con.execute(sqlgen.domain_normalize_sql(DUCK)).df()
              .sort_values("row_id").reset_index(drop=True))
        de = ri.domain_normalize(df["text"])
        for col in de.columns:
            if [v if pd.notna(v) else None for v in dn[col]] \
                    != list(de[col]):
                print(f"DOMAIN MISMATCH batch={batch} col={col}")
                fails += 1

        scores = exp["quality_score"].to_numpy()
        for _, row in con.execute(_q_threshold_sweep(DUCK)).df().iterrows():
            if row["n_keep"] != int((scores >= row["threshold"]).sum()):
                print(f"SWEEP MISMATCH batch={batch} t={row['threshold']}")
                fails += 1
        for _, row in con.execute(_q_score_quantiles(DUCK)).df().iterrows():
            vals = np.sort(scores[df["lang"].to_numpy() == row["lang"]])
            for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
                if row[col] != vals[int(math.ceil(len(vals) * p)) - 1]:
                    print(f"QUANTILE MISMATCH batch={batch} "
                          f"lang={row['lang']} {col}")
                    fails += 1
    print(f"deep fuzz done: {batches} batches x {rows} captions, "
          f"{'FAILS: ' + str(fails) if fails else 'zero mismatches'}")
    return fails


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=60)
    ap.add_argument("--rows", type=int, default=200)
    ap.add_argument("--seed", type=int, default=20260818)
    args = ap.parse_args()
    sys.exit(1 if run(args.batches, args.rows, args.seed) else 0)
