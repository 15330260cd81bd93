"""Skew handling: salted repartition + two-phase (salted) aggregation.

North-rule requirement: "partitioning / shuffle / skew handled explicitly
... salted repartitioning to defuse skew on hot languages". The synthetic
corpus (and any web-scale crawl) has a hot-language cluster: a plain
``groupBy(lang)`` sends every row of the hot language to one reducer.

Two tools, both deterministic:

* ``salted_repartition`` — spread a hot key across ``n_salt`` partitions
  by co-hashing a stable per-row salt (xxhash64 of the row id, NOT a
  random number: task retries must land rows identically).
* ``salted_sum_agg`` — the classic two-phase aggregation: phase 1 groups
  by (keys, salt) so each hot key is reduced by up to ``n_salt`` tasks in
  parallel; phase 2 combines the ≤ n_salt partial rows per key. For
  algebraic aggregates (count/sum/min/max) the result is identical to the
  direct groupBy — proven against the DuckDB oracle by the
  ``keep_by_lang_salted`` registry entry.

Note Spark's own mitigations: map-side partial aggregation already bounds
shuffle volume for groupBy, and AQE splits skewed JOIN partitions
(``spark.sql.adaptive.skewJoin``, on in session.py). Explicit salting is
the tool for the remaining case: a reduce whose per-key state must not
concentrate (giant groups in window/collect-style ops) — and the pattern
the north rule asks us to evidence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def stable_salt(id_col: str, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): stable across runs and retries."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).cast("int")


def _check_no_salt_col(df: DataFrame) -> None:
    # withColumn REPLACES by name: a pre-existing _salt column would be
    # silently overwritten (then dropped / wrongly grouped) — the same
    # temp-column clash apply_core_rules raises on
    if SALT_COL in df.columns:
        raise ValueError(
            f"input already has a {SALT_COL!r} column; rename it — the "
            f"salting operators reserve that name")


def salted_repartition(df: DataFrame, keys: list[str], id_col: str,
                       n_salt: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by (keys..., salt) so one hot key spans n_salt partitions."""
    _check_no_salt_col(df)
    out = df.withColumn(SALT_COL, stable_salt(id_col, n_salt))
    cols = [F.col(k) for k in keys] + [F.col(SALT_COL)]
    if num_partitions:
        out = out.repartition(num_partitions, *cols)
    else:
        out = out.repartition(*cols)
    return out.drop(SALT_COL)


def salted_sum_agg(df: DataFrame, keys: list[str],
                   sums: dict[str, Column], id_col: str,
                   n_salt: int = 16) -> DataFrame:
    """Two-phase skew-defused aggregation.

    ``sums`` maps output alias -> row-level Column to sum (use
    ``F.lit(1)`` for counts). Result equals
    ``df.groupBy(keys).agg(sum(...))`` exactly (sums of longs/ints are
    associative; for doubles the regroup can differ in last-ulp like any
    Spark partition reordering).
    """
    _check_no_salt_col(df)
    salted = df.withColumn(SALT_COL, stable_salt(id_col, n_salt))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[F.sum(c).alias(f"_p_{a}") for a, c in sums.items()])
    final = partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{a}").alias(a) for a in sums])
    return final
