"""Checkpoint/resume semantics: kill mid-run, restart, byte-identical result
(SURVEY.md section 5.5; cache_manager.py keyed-upsert semantics)."""

import time

import pytest

from bioanalyzer_backend_spark.plans import resume
from bioanalyzer_backend_spark.plans.resume import run_with_resume
from bioanalyzer_backend_spark.sources.catalog import LocalSnapshotTable


def _tables(tmp_path):
    return (LocalSnapshotTable(str(tmp_path / "results")),
            LocalSnapshotTable(str(tmp_path / "audit")),
            LocalSnapshotTable(str(tmp_path / "ckpt")))


def _collect_sorted(spark, tbl):
    # is_dup included since round 5: the dedup flag is stamped GLOBALLY
    # at staging, so resumed runs match the whole-table batch pipeline
    # on it too (previously group-local and excluded here)
    df = tbl.read(spark)
    return sorted((r["image_id"], r["keep"], r["scrubbed_caption"],
                   r["is_dup"])
                  for r in df.select("image_id", "keep",
                                     "scrubbed_caption",
                                     "is_dup").collect())


def test_resume_after_injected_failure(spark, synth_images_df, tmp_path,
                                       artifacts_dir):
    df = synth_images_df.limit(400)

    # reference run: uninterrupted
    r_res, r_aud, r_ck = _tables(tmp_path / "ref")
    stats = run_with_resume(spark, df, r_res, r_aud, r_ck, n_groups=4)
    assert stats["newly_committed"] == 4
    expected = _collect_sorted(spark, r_res)

    # the grouped/resumed run must agree with the PLAIN whole-table
    # pipeline on every flag — including is_dup, whose dup pairs span
    # id-hash groups (group-local dedup would mark both canonical)
    from bioanalyzer_backend_spark.plans import pipeline as P
    plain = sorted(
        (r["image_id"], r["keep"], r["scrubbed_caption"], r["is_dup"])
        for r in P.quality_filter(df)
        .select("image_id", "keep", "scrubbed_caption", "is_dup")
        .collect())
    assert expected == plain
    # sanity: the corpus actually exercises the cross-group case
    assert any(t[3] for t in plain), "corpus must contain dup rows"

    # crashed run: dies after 2 of 4 group commits
    c_res, c_aud, c_ck = _tables(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_resume(spark, df, c_res, c_aud, c_ck, n_groups=4,
                        fail_after=2)
    assert len(resume.committed_groups(spark, c_ck)) == 2

    # restart: must process ONLY the 2 remaining groups
    stats2 = run_with_resume(spark, df, c_res, c_aud, c_ck, n_groups=4)
    assert stats2["newly_committed"] == 2
    assert _collect_sorted(spark, c_res) == expected

    # idempotent: third run does nothing
    stats3 = run_with_resume(spark, df, c_res, c_aud, c_ck, n_groups=4)
    assert stats3["newly_committed"] == 0
    assert _collect_sorted(spark, c_res) == expected

    # audit rows exist with positive counts
    aud = c_aud.read(spark).toPandas()
    assert set(aud["rule"]) == {"len", "word", "rep", "alpha", "stop"}
    assert (aud["n_in"] > 0).all()


def test_snapshot_atomicity(spark, tmp_path):
    tbl = LocalSnapshotTable(str(tmp_path / "t"))
    assert tbl.read(spark) is None
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    tbl.append(df1)
    assert tbl.read(spark).count() == 2
    tbl.append(spark.createDataFrame([(3, "c")], "k int, v string"))
    assert tbl.read(spark).count() == 3
    assert len(tbl.history()) == 2


def test_merge_by_key_upsert(spark, tmp_path):
    """INSERT OR REPLACE semantics of cache_manager.py:100-111."""
    tbl = LocalSnapshotTable(str(tmp_path / "m"))
    tbl.append(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    tbl.merge_by_key(
        spark, spark.createDataFrame([(2, "B"), (3, "C")], "k int, v string"),
        "k")
    got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "C"}


def test_crash_between_commits_rolls_forward(spark, synth_images_df,
                                             tmp_path, artifacts_dir):
    """Crash AFTER results.append but BEFORE the checkpoint row: the
    restart must roll the half-committed group forward (regenerate audit,
    append checkpoint) — NOT reprocess it, which would duplicate rows."""
    df = synth_images_df.limit(300)
    res, aud, ck = _tables(tmp_path / "half")

    with pytest.raises(RuntimeError, match="between commits"):
        run_with_resume(spark, df, res, aud, ck, n_groups=4,
                        fail_between_commits=True, fail_after=1)
    # rows of the crashed group ARE published, checkpoint row is NOT
    assert res.read(spark) is not None
    assert len(resume.committed_groups(spark, ck)) == 0

    stats = run_with_resume(spark, df, res, aud, ck, n_groups=4)
    assert len(stats["repaired_groups"]) == 1
    assert stats["newly_committed"] == 3

    # no duplicates: every image_id appears exactly once
    got = res.read(spark)
    assert got.count() == df.count()
    assert got.select("image_id").distinct().count() == df.count()
    # the repaired group's audit rows were regenerated under the
    # repairing run's id (audit part_id is the PHYSICAL partition id,
    # not the group id — see plans/audit.py)
    rid = stats["run_id"]
    assert aud.read(spark).where(f"run_id = '{rid}'").count() > 0
    # repaired checkpoint rows are stamped 'repair:<run_id>', so a
    # throughput metric filtering run_id == rid cannot claim the crashed
    # run's rows (jobs/quality_filter.py rows_this_run)
    repaired_ck = ck.read(spark).where("run_id like 'repair:%'").collect()
    assert {r["part_id"] for r in repaired_ck} == set(stats["repaired_groups"])


def test_crash_after_audit_repair_is_idempotent(spark, synth_images_df,
                                                tmp_path, artifacts_dir):
    """Crash AFTER the audit append but BEFORE the checkpoint row: the
    group's audit rows are already committed, so the roll-forward must
    delete-then-reappend by group_id — a blind re-append would double the
    lineage hit counts."""
    df = synth_images_df.limit(300)
    res, aud, ck = _tables(tmp_path / "aud")

    with pytest.raises(RuntimeError, match="after audit"):
        run_with_resume(spark, df, res, aud, ck, n_groups=4,
                        fail_after_audit=True, fail_after=1)
    # rows AND audit are published; checkpoint row is not
    assert res.read(spark) is not None
    assert aud.read(spark) is not None
    assert len(resume.committed_groups(spark, ck)) == 0
    crashed_group = res.read(spark).select("part_id").distinct().collect()
    g = crashed_group[0]["part_id"]

    stats = run_with_resume(spark, df, res, aud, ck, n_groups=4)
    assert stats["repaired_groups"] == [g]

    # per-rule input counts for the repaired group equal the group's row
    # count EXACTLY once — doubling would make this 2x
    group_rows = res.read(spark).where(f"part_id = {g}").count()
    per_rule = (aud.read(spark).where(f"group_id = {g}")
                .groupBy("rule").sum("n_in").collect())
    assert per_rule, "repaired group has audit rows"
    for r in per_rule:
        assert r["sum(n_in)"] == group_rows


def test_open_table_routing_matches_classpath(spark, tmp_path):
    """have_iceberg must reflect the REAL classpath (py4j returns a
    truthy JavaPackage for missing classes, so the old attribute probe
    was always True and the loud no-runtime ValueError was dead code);
    open_table routes identifiers to Iceberg-or-raise and paths to the
    snapshot fallback."""
    from bioanalyzer_backend_spark.sources import catalog as C

    from .test_iceberg_runtime import _iceberg_jar_present

    assert C.have_iceberg(spark) == _iceberg_jar_present()
    if not C.have_iceberg(spark):
        with pytest.raises(ValueError, match="Iceberg"):
            C.open_table(spark, "cat.db.tbl")
    t = C.open_table(spark, str(tmp_path / "tbl"))
    assert isinstance(t, C.LocalSnapshotTable)


def test_delete_where_snapshot(spark, tmp_path):
    """Row-level DELETE commits a new snapshot; time travel still sees
    the deleted rows in the prior snapshot."""
    tbl = LocalSnapshotTable(str(tmp_path / "d"))
    tbl.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"))
    before = tbl.history()[0]
    tbl.delete_where(spark, "k = 2")
    got = sorted(r["k"] for r in tbl.read(spark).collect())
    assert got == [1, 3]
    old = sorted(r["k"] for r in
                 tbl.read(spark, snapshot_id=before).collect())
    assert old == [1, 2, 3]


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """Standard SQL DELETE semantics (Iceberg-compatible): a row whose
    predicate evaluates NULL — e.g. a NULL group_id under
    ``group_id = 3`` — must be KEPT, not swept away by a naive
    ``where(~cond)`` rewrite. The audit table mixes resume-stamped rows
    (group_id set) with plain lineage appends (group_id NULL); a crash
    repair that deletes one group must not eat the NULL rows."""
    tbl = LocalSnapshotTable(str(tmp_path / "n"))
    tbl.append(spark.createDataFrame(
        [(3, "stamped"), (None, "lineage"), (4, "other")],
        "group_id int, v string"))
    tbl.delete_where(spark, "group_id = 3")
    got = sorted(((r["group_id"], r["v"])
                  for r in tbl.read(spark).collect()), key=str)
    assert got == [(4, "other"), (None, "lineage")]


def test_stale_stage_dirs_swept_on_resume(spark, synth_images_df, tmp_path,
                                          artifacts_dir):
    """A crashed run leaves its staged input copy behind (a killed JVM
    cannot clean up); the NEXT run must sweep stale stage-* dirs before
    staging anew, or full input copies — image bytes included —
    accumulate per crash/resume cycle."""
    import glob
    import os

    df = synth_images_df.limit(150)
    res, aud, ck = _tables(tmp_path / "sweep")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_resume(spark, df, res, aud, ck, n_groups=4, fail_after=1)
    assert len(glob.glob(os.path.join(res.root, "stage-*"))) == 1

    run_with_resume(spark, df, res, aud, ck, n_groups=4)
    assert glob.glob(os.path.join(res.root, "stage-*")) == []


def test_lockless_stage_dir_gets_mtime_grace(tmp_path):
    """Mixed-version guard (round-4 advice): a stage dir with NO
    liveness-lock sibling may belong to a LIVE run on pre-lock code —
    it is only swept once older than the grace window; a fresh one is
    left alone. Lock-bearing dirs keep pure flock-probe semantics."""
    import os

    from bioanalyzer_backend_spark.plans.resume import _sweep_dead_stages

    root = str(tmp_path)
    fresh = os.path.join(root, "stage-fresh")
    old = os.path.join(root, "stage-old")
    os.makedirs(fresh)
    os.makedirs(old)
    past = time.time() - 3600
    os.utime(old, (past, past))
    _sweep_dead_stages(root, keep=os.path.join(root, "stage-self"),
                       lockless_grace_s=900.0)
    assert os.path.isdir(fresh)        # inside grace -> possibly live
    assert not os.path.exists(old)     # past grace -> dead, swept


def test_input_scanned_once_via_staging(spark, synth_images_df, tmp_path,
                                        artifacts_dir):
    """IO assertion for the staged-input design: the (expensive) input
    lineage is evaluated ONCE — during staging — not once per group.
    A per-group filter on the computed hash would re-execute the input
    scan n_groups times (the marker UDF would fire 4x per row)."""
    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)

    @F.udf("int")
    def marker(_):
        acc.add(1)
        return 1

    df = synth_images_df.limit(200).withColumn("_scan_marker",
                                               marker("image_id"))
    res, aud, ck = _tables(tmp_path / "scan")
    stats = run_with_resume(spark, df, res, aud, ck, n_groups=4)
    assert stats["newly_committed"] == 4
    assert acc.value == 200, (
        f"input lineage ran {acc.value / 200:.1f}x per row; staging "
        "must evaluate it exactly once")


def test_resume_rejects_changed_n_groups(spark, synth_images_df, tmp_path):
    """part_id is a hash modulo n_groups; resuming under a different
    modulus reinterprets committed ids and silently duplicates/skips
    rows — must raise instead (checkpoint rows record n_groups)."""
    df = synth_images_df.limit(120)
    res, aud, ck = _tables(tmp_path / "ng")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_resume(spark, df, res, aud, ck, n_groups=4, fail_after=1)
    with pytest.raises(ValueError, match="n_groups"):
        run_with_resume(spark, df, res, aud, ck, n_groups=8)
    # the original value still resumes fine
    stats = run_with_resume(spark, df, res, aud, ck, n_groups=4)
    assert stats["groups_done"] == 4


def test_stage_input_rejects_part_id_clash(spark, synth_images_df, tmp_path):
    """Same clash discipline as apply_core_rules / salted aggs: a
    caller's pre-existing part_id column must raise, not silently
    vanish."""
    from pyspark.sql import functions as F

    from bioanalyzer_backend_spark.plans.resume import stage_input
    df = synth_images_df.limit(10).withColumn("part_id", F.lit(7))
    with pytest.raises(ValueError, match="part_id"):
        stage_input(spark, df, str(tmp_path / "stage"), 4)


def test_corrupt_head_raises_not_empty(spark, tmp_path):
    """HEAD naming a missing manifest is corruption: reading it as an
    empty table would let the next append permanently publish the
    truncation of all prior contents."""
    import os

    tbl = LocalSnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.range(5).toDF("x"))
    snap = tbl.current_snapshot()
    os.remove(os.path.join(tbl.meta_dir, snap["snapshot"]))
    with pytest.raises(RuntimeError, match="corrupt"):
        tbl.current_snapshot()
    with pytest.raises(RuntimeError, match="corrupt"):
        tbl.read(spark)


def test_merge_by_key_with_extra_target_columns(spark, tmp_path):
    """A target that carries bookkeeping columns the source lacks (the
    appender's _batch_id/_query_id shape) must merge, with NULLs for the
    source side's missing columns — previously unionByName crashed."""
    tbl = LocalSnapshotTable(str(tmp_path / "mx"))
    tbl.append(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 11)], "k int, v string, _batch_id long"))
    tbl.merge_by_key(
        spark, spark.createDataFrame([(2, "B"), (3, "C")], "k int, v string"),
        "k")
    rows = {r["k"]: (r["v"], r["_batch_id"]) for r in tbl.read(spark).collect()}
    assert rows == {1: ("a", 10), 2: ("B", None), 3: ("C", None)}
