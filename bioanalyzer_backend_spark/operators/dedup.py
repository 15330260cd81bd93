"""Deduplication operators for training-data pipelines.

Four families over the image+caption table (and any text table):

  * exact      — hash-groupBy on a key (phash / content fingerprint);
  * MinHash+LSH— shingle -> minhash -> band -> bucket-join candidates;
  * SimHash    — 64-bit near-dup signature, Hamming-bucket candidates;
  * n-gram Jaccard — verified similarity on candidate pairs.

All are DataFrame-native where possible; SimHash uses one Arrow-batched
pandas UDF (variable-length token sets don't vectorize as Columns).
Shuffle hygiene: every operator shuffles only (id, key/signature)
projections, never the binary ``bytes`` column; callers re-attach flags by
id (broadcast-able) — see plans/pipeline.apply_dedup_flag.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import sqlgen


def exact_dedup(df: DataFrame, key: str = "phash",
                id_col: str = "image_id") -> DataFrame:
    """Keep only canonical rows (min id per key group) — A7 semantics.

    groupBy+min instead of a window: the algebraic aggregate gets
    map-side partial combine, so a mass-duplicated key reduces to one row
    per map task instead of concentrating all rows in one window reducer
    (same rationale as plans/pipeline.apply_dedup_flag)."""
    slim = (df.select(id_col, key)
            .groupBy(key).agg(F.min(id_col).alias(id_col))
            .select(id_col))
    return df.join(slim, id_col, "left_semi")


def _tokens_col(text_col: str):
    return F.expr(sqlgen.tokens_expr(text_col, sqlgen.SPARK))


def shingles(df: DataFrame, text_col: str, id_col: str,
             n: int = 3) -> DataFrame:
    """(id, shingle) pairs: distinct word n-gram shingles."""
    toks = df.select(F.col(id_col).alias("_id"),
                     _tokens_col(text_col).alias("toks"))
    parts = ", ".join(f"element_at(toks, i + {j})" for j in range(n))
    sh = toks.selectExpr(
        "_id",
        f"array_distinct(transform({sqlgen.int_seq('1', f'size(toks) - {n-1}', sqlgen.SPARK)}, "
        f"i -> concat_ws(' ', {parts}))) AS sh")
    return sh.select("_id", F.explode("sh").alias("shingle"))


# Persisted signature frames from cap_buckets, released via
# release_cap_caches() once the caller has materialized its candidates
# (the persist exists so the expensive shingle+md5 lineage is evaluated
# once for counts + anti-join + self-join, not once per branch).
_CAP_CACHES: list[DataFrame] = []


def release_cap_caches() -> int:
    """Unpersist every signature frame cached by cap_buckets since the
    last release. Call after materializing candidate pairs/reports —
    candidates are lazy, so cap_buckets itself cannot know when its
    cache stops being needed. Returns the number released."""
    n = len(_CAP_CACHES)
    while _CAP_CACHES:
        _CAP_CACHES.pop().unpersist()
    return n


def cap_buckets(sig: DataFrame, keys: list[str],
                max_bucket: int) -> tuple[DataFrame, DataFrame]:
    """Mega-bucket defusal for LSH-style self-joins.

    A degenerate bucket (empty captions, boilerplate) of size m contributes
    m^2/2 candidate pairs — at 10^12 rows one hot bucket is a job-killer,
    and its pairs are near-worthless (the bucket key itself already says
    "template text"). Standard large-scale-dedup practice is to skip
    buckets above a cap and REPORT them (no silent truncation): returns
    ``(filtered_sig, dropped_report)`` where the report carries one row
    per skipped bucket with its size, suitable for the audit table.

    The signature frame is persisted (counts agg + anti-join probe +
    the caller's self-join would otherwise re-evaluate the giant HOF
    lineage per branch); the cache is registered for
    ``release_cap_caches()`` — call it once candidates are materialized.
    No broadcast hint on the hot-bucket anti-join: the over-cap bucket
    set is unbounded at 10^12 rows (up to rows/max_bucket entries), so
    AQE decides at runtime from the measured size.
    """
    sig = sig.persist()
    _CAP_CACHES.append(sig)
    counts = sig.groupBy(*keys).agg(F.count("*").alias("bucket_n"))
    hot = counts.where(F.col("bucket_n") > max_bucket)
    kept = sig.join(hot.select(*keys), keys, "left_anti")
    return kept, hot


def minhash_lsh_candidates(df: DataFrame, text_col: str = "caption",
                           id_col: str = "image_id",
                           n_bands: int = 4, n_rows: int = 4,
                           max_bucket: int | None = None,
                           return_report: bool = False):
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash.

    ``n_rows`` minhashes per band (default b=4, r=4 — candidate
    threshold (1/b)^(1/r) ~= 0.71, matched to the 0.8 Jaccard verify
    bar; r=1 admits candidates from s ~= 0.16, exploding the candidate
    volume quadratically at 10^12 rows). Deterministic hash family:
    4-hex-char slices of seeded md5 digests (8 slices/digest, hash ONCE
    per digest then slice — md5 inside interpreted HOF lambdas is the
    expensive part); a band signature concatenates its r slice-mins.
    All signature work is a NATIVE per-row expression, no explode, no
    groupBy: the only shuffle in the candidates plan is the final bucket
    join on (band, signature), which carries two short strings per row —
    at 10^12 rows the shingle explosion never hits the wire.
    """
    toks = df.select(F.col(id_col).alias("_id"),
                     _tokens_col(text_col).alias("toks"))
    parts = ", ".join(f"element_at(toks, i + {j})" for j in range(3))
    sh = toks.selectExpr(
        "_id",
        f"array_distinct(transform({sqlgen.int_seq('1', 'size(toks) - 2', sqlgen.SPARK)}, "
        f"i -> concat_ws(' ', {parts}))) AS sh")
    n_digests = -(-(n_bands * n_rows) // 8)
    sh = sh.selectExpr("_id", *[
        (f"transform(sh, g -> md5('{'~' * k}' || g)) AS hs{k}" if k
         else "transform(sh, g -> md5(g)) AS hs0")
        for k in range(n_digests)])

    def _min_slice(i: int) -> str:
        dig, off = divmod(i, 8)
        return (f"array_min(transform(hs{dig}, "
                f"h -> substring(h, {4 * off + 1}, 4)))")

    mins = [F.expr(" || ".join(_min_slice(b * n_rows + r)
                               for r in range(n_rows))).alias(f"mh{b}")
            for b in range(n_bands)]
    stack_args = ", ".join(f"{b}, mh{b}" for b in range(n_bands))
    sig = (sh.select("_id", *mins)
           .selectExpr("_id", f"stack({n_bands}, {stack_args}) AS (band, sig)")
           .where(F.col("sig").isNotNull()))
    hot = None
    if max_bucket is not None:
        sig, hot = cap_buckets(sig, ["band", "sig"], max_bucket)
    a = sig.alias("a")
    b = sig.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.sig") == F.col("b.sig"))
                    & (F.col("a._id") < F.col("b._id")))
             .select(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"))
             .distinct())
    if return_report:
        # no silent caps: hand the skipped-bucket rows to the caller for
        # the audit table (empty frame when max_bucket is None)
        if hot is None:
            hot = sig.select(F.lit(0).alias("band"), F.col("sig"),
                             F.lit(0).cast("long").alias("bucket_n")).limit(0)
        return pairs, hot
    return pairs


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "caption",
                   id_col: str = "image_id",
                   threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (verification stage)."""
    sh = shingles(df, text_col, id_col)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    inter = (sh.alias("x")
             .join(pairs, F.col("x._id") == F.col("id_a"))
             .join(sh.alias("y"),
                   (F.col("y._id") == F.col("id_b"))
                   & (F.col("x.shingle") == F.col("y.shingle")))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.withColumnRenamed("_id", "id_a")
                 .withColumnRenamed("n_sh", "na"), "id_a")
           .join(sizes.withColumnRenamed("_id", "id_b")
                 .withColumnRenamed("n_sh", "nb"), "id_b")
           .withColumn("jaccard",
                       F.col("inter").cast("double")
                       / (F.col("na") + F.col("nb") - F.col("inter"))))
    return out.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

_SIMHASH_BITS = 64
_MULT = np.uint64(1099511628211)       # FNV-ish, deterministic
_OFFS = np.uint64(14695981039346656037)


def _token_hash64(tok: str) -> np.uint64:
    h = _OFFS
    for byte in tok.encode("utf-8"):
        h = np.uint64((int(h) ^ byte) * int(_MULT) % (1 << 64))
    return h


def simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text (token-level, FNV-1a token hashes)."""
    from ..rules.reference_impl import tokenize
    out = np.zeros(len(texts), dtype=np.int64)
    bit_cols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for i, t in enumerate(texts.fillna("")):
        toks = tokenize(t)
        if not toks:
            out[i] = 0
            continue
        hs = np.array([_token_hash64(tok) for tok in set(toks)],
                      dtype=np.uint64)
        bits = ((hs[:, None] & bit_cols[None, :]) != 0)
        votes = bits.sum(axis=0) * 2 - len(hs)
        sig = np.uint64(0)
        for bit in np.nonzero(votes > 0)[0]:
            sig |= bit_cols[bit]
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def with_simhash(df: DataFrame, text_col: str = "caption") -> DataFrame:
    @F.pandas_udf("long")
    def _udf(s: pd.Series) -> pd.Series:
        return simhash_batch(s)
    return df.withColumn("simhash", _udf(F.col(text_col)))


def simhash_candidates(df: DataFrame, text_col: str = "caption",
                       id_col: str = "image_id",
                       n_blocks: int = 4,
                       max_bucket: int | None = None,
                       return_report: bool = False):
    """Hamming-near pairs via block permutation: signatures agreeing on any
    16-bit block are candidates (finds all pairs within Hamming radius
    n_blocks-1 by pigeonhole)."""
    sig = with_simhash(df.select(id_col, text_col), text_col) \
        .select(F.col(id_col).alias("_id"), "simhash")
    blocks = []
    for bi in range(n_blocks):
        blocks.append(sig.select(
            "_id", F.lit(bi).alias("block"),
            F.shiftrightunsigned(F.col("simhash"), bi * 16)
            .bitwiseAND(F.lit(0xFFFF)).alias("key"), "simhash"))
    allb = blocks[0]
    for b in blocks[1:]:
        allb = allb.unionByName(b)
    hot = None
    if max_bucket is not None:
        allb, hot = cap_buckets(allb, ["block", "key"], max_bucket)
    a, b = allb.alias("a"), allb.alias("b")
    pairs = (a.join(b, (F.col("a.block") == F.col("b.block"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a._id") < F.col("b._id")))
             .select(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"),
                     F.col("a.simhash").alias("sig_a"),
                     F.col("b.simhash").alias("sig_b"))
             .distinct())
    if return_report:
        if hot is None:
            hot = allb.select("block", "key",
                              F.lit(0).cast("long").alias("bucket_n")).limit(0)
        return pairs, hot
    return pairs
