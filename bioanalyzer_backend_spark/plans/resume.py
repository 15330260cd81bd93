"""Checkpointed execution with exact resume (north-rule requirement).

Semantics inherited from the reference's cache-or-compute pattern
(app/services/cache_manager.py:91-166: keyed lookup, else compute and
upsert): work is split into deterministic id-hash groups; each group's
results commit atomically (results + audit + checkpoint row); a re-run
left-anti-joins the checkpoint table and processes only uncommitted
groups. A crash between commits loses at most one in-flight group and
never corrupts published state (snapshot atomicity in sources/catalog.py).

At warehouse scale, groups map to Iceberg partitions and the driver loop
becomes sequential staged jobs over bucket(image_id, N).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import LocalSnapshotTable
from . import pipeline as pipe
from .audit import audit_rows


def group_of(id_col: str, n_groups: int):
    """Deterministic group id: stable across runs/restarts (xxhash64)."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).cast("int")


def committed_groups(spark: SparkSession, ckpt: LocalSnapshotTable) -> set[int]:
    df = ckpt.read(spark)
    if df is None:
        return set()
    return {r["part_id"] for r in df.select("part_id").distinct().collect()}


def run_with_resume(spark: SparkSession, images: DataFrame,
                    results: LocalSnapshotTable, audit: LocalSnapshotTable,
                    ckpt: LocalSnapshotTable, n_groups: int = 8,
                    run_id: str | None = None,
                    fail_after: int | None = None) -> dict:
    """Process all uncommitted groups; returns run stats.

    ``fail_after`` aborts after that many group commits (test hook for the
    kill/restart scenario of SURVEY.md section 5.5).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    tagged = images.withColumn("part_id", group_of("image_id", n_groups))
    done = committed_groups(spark, ckpt)
    todo = [g for g in range(n_groups) if g not in done]
    n_committed = 0
    for g in todo:
        t0 = time.time()
        sub = tagged.filter(F.col("part_id") == g).drop("part_id")
        out = pipe.quality_filter(sub)
        out = out.withColumn("part_id", F.lit(g))
        results.append(out)
        wall_ms = (time.time() - t0) * 1000.0
        audit.append(audit_rows(out, run_id, wall_ms))
        n_rows = out.count()
        ckpt.append(spark.createDataFrame(
            [(g, run_id, n_rows, float(time.time()))],
            "part_id int, run_id string, n_rows long, committed_at double"))
        n_committed += 1
        if fail_after is not None and n_committed >= fail_after:
            raise RuntimeError(f"injected failure after {n_committed} groups")
    return {"run_id": run_id, "groups_done": len(done) + n_committed,
            "groups_total": n_groups, "newly_committed": n_committed}
