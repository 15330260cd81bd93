"""Snapshot-table storage layer: Iceberg semantics on plain parquet.

The reference caches every intermediate in SQLite with keyed
INSERT OR REPLACE (app/services/cache_manager.py:50-126); the warehouse
equivalents are Iceberg tables with append/MERGE and snapshot isolation.
The sandbox's PySpark bundles no Iceberg runtime jar (SURVEY.md section 7),
so this module implements the same COMMIT semantics on a parquet directory:

  * data files are written to ``data/`` with unique names (write-once);
  * a snapshot is a JSON manifest listing its data files;
  * ``HEAD`` names the current snapshot and is replaced atomically
    (os.replace — POSIX rename atomicity);
  * readers resolve HEAD -> manifest -> exact file list, so a killed
    writer can never half-publish (exact-resume requirement).

With a real cluster + Iceberg jar, ``IcebergTable`` below routes the same
calls through ``df.writeTo(...)`` / MERGE INTO; selection is automatic.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class LocalSnapshotTable:
    """Append-only snapshot table with atomic commits on local parquet."""

    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "metadata")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------------

    def _head_path(self) -> str:
        return os.path.join(self.meta_dir, "HEAD")

    def current_snapshot(self) -> dict | None:
        """HEAD manifest, or None for a genuinely empty table (no HEAD).

        A HEAD that names a MISSING manifest is corruption, not
        emptiness, and must raise: treating it as None would report the
        table empty and the next append would commit parent=None with
        files=[] + its batch — silently and permanently publishing the
        truncation of the whole prior table (partial restore / rsync of
        the metadata dir is the realistic trigger; _commit fsyncs file
        contents, not the directory entry ordering)."""
        try:
            with open(self._head_path()) as f:
                name = f.read().strip()
        except FileNotFoundError:
            return None
        try:
            with open(os.path.join(self.meta_dir, name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise RuntimeError(
                f"snapshot table {self.root} is corrupt: HEAD names "
                f"{name} but that manifest does not exist — refusing to "
                f"treat the table as empty (restore the metadata dir or "
                f"repoint HEAD at a surviving snap-*.json)") from None

    def _commit(self, files: list[str], parent: str | None,
                operation: str) -> str:
        snap_id = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.json"
        manifest = {"snapshot": snap_id, "parent": parent,
                    "operation": operation, "files": sorted(files)}
        path = os.path.join(self.meta_dir, snap_id)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        head_tmp = self._head_path() + ".tmp"
        with open(head_tmp, "w") as f:
            f.write(snap_id)
            f.flush()
            os.fsync(f.fileno())
        os.replace(head_tmp, self._head_path())   # the atomic publish
        return snap_id

    def _commit_lock(self, timeout_s: float = 60.0):
        """Exclusive lock around the (sub-second) read-parent ->
        publish-HEAD section ONLY — slow work (Spark writes) must happen
        outside it, which is why merge/compact use optimistic retry
        instead of holding this across their rewrite.

        flock(LOCK_EX) on a persistent lock file: the kernel releases
        the lock when the holder's fd closes — including process death —
        so there is no stale-lock state and no break protocol at all.
        (The previous create/unlink scheme checked mtime staleness and
        then renamed the lock away; between the check and the rename the
        real holder could release and a NEW holder acquire, so the
        rename would break a live, fresh lock and admit two writers into
        the read-parent->publish section — a lost-HEAD-update window.
        flock's single-winner guarantee is the kernel's.) The lock file
        is never unlinked: unlinking would let a late waiter lock an
        orphaned inode while a new creator locks the fresh one. flock
        excludes per open-file-description, so threads in one process
        exclude each other too (each waiter opens its own fd). Local
        POSIX filesystems only — exactly LocalSnapshotTable's scope; a
        real warehouse deployment uses Iceberg catalog CAS commits
        (IcebergTable below)."""
        import contextlib
        import fcntl

        lock_path = os.path.join(self.meta_dir, "COMMIT_LOCK")

        @contextlib.contextmanager
        def lock():
            fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
            deadline = time.time() + timeout_s
            try:
                while True:
                    try:
                        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                        break
                    except OSError:
                        if time.time() > deadline:
                            raise TimeoutError(
                                f"commit lock busy: {lock_path}")
                        time.sleep(0.02)
                yield
            finally:
                os.close(fd)   # releases the flock

        return lock()

    def _head_snapshot_id(self) -> str | None:
        cur = self.current_snapshot()
        return cur["snapshot"] if cur else None

    def history(self) -> list[str]:
        out = []
        snap = self.current_snapshot()
        while snap is not None:
            out.append(snap["snapshot"])
            parent = snap.get("parent")
            if parent is None:
                break
            with open(os.path.join(self.meta_dir, parent)) as f:
                snap = json.load(f)
        return out

    # -- operations ------------------------------------------------------------

    def _write_batch(self, df: DataFrame | None) -> tuple[str, list[str]]:
        """Write *df* to a fresh uuid dir under data/, returning
        ``(batch_dir, parquet_files)``; ``df=None`` yields an empty dir
        (the racer-emptied-table arm of delete/compact). The ONE copy of
        the write-then-list block (was pasted into append/merge/delete/
        compact, which had started to diverge). A failed Spark write
        removes its own partial dir — unreferenced data dirs must never
        outlive the call that created them (see append/_commit_rewrite
        for the commit-phase counterpart)."""
        import shutil
        batch_dir = os.path.join(self.data_dir, uuid.uuid4().hex)
        if df is None:
            os.makedirs(batch_dir, exist_ok=True)
            return batch_dir, []
        try:
            df.write.mode("overwrite").parquet(batch_dir)
        except Exception:
            shutil.rmtree(batch_dir, ignore_errors=True)
            raise
        return batch_dir, [os.path.join(batch_dir, f)
                           for f in os.listdir(batch_dir)
                           if f.endswith(".parquet")]

    def append(self, df: DataFrame) -> str:
        """Write df as new data files, then atomically extend the manifest.
        The (slow) data write happens unlocked — unique dirs can't clash;
        only the read-parent -> publish-HEAD section is exclusive. If the
        commit phase fails (lock timeout), the just-written orphan dir is
        reclaimed — no manifest references it, so nothing else ever
        would."""
        import shutil
        batch_dir, new_files = self._write_batch(df)
        try:
            with self._commit_lock():
                cur = self.current_snapshot()
                files = (cur["files"] if cur else []) + new_files
                return self._commit(files, cur["snapshot"] if cur else None,
                                    "append")
        except Exception:
            shutil.rmtree(batch_dir, ignore_errors=True)
            raise

    def _commit_rewrite(self, df_fn, operation: str,
                        max_retries: int = 8) -> str:
        """Optimistic concurrency for content-dependent rewrites (the
        Iceberg commit model): build the rewrite DataFrame via ``df_fn``
        and run the SLOW Spark write of it UNLOCKED, then take the lock
        only to check the parent is still HEAD and publish. If another
        writer committed meanwhile, discard the orphan files and redo the
        rewrite against the new HEAD — never hold the lock across a Spark
        job (a long rewrite would look like a stale lock to waiters and
        get broken).

        A write-phase FAILURE is also retried when HEAD moved since the
        parent was read: a concurrent expire_snapshots may have reclaimed
        the very files the rewrite was scanning (the standard
        read-vs-expire race — Iceberg rewrites hit the same
        FileNotFoundException), and the retry re-reads the new HEAD whose
        files are live. HEAD unchanged means the failure is real. Every
        failure path reclaims its orphan dir."""
        import shutil

        last_exc: Exception | None = None
        for attempt in range(max_retries):
            parent = self._head_snapshot_id()
            batch_dir = None
            try:
                batch_dir, new_files = self._write_batch(df_fn())
                with self._commit_lock():
                    if self._head_snapshot_id() == parent:
                        return self._commit(new_files, parent, operation)
            except Exception as exc:
                if batch_dir is not None:
                    shutil.rmtree(batch_dir, ignore_errors=True)
                if self._head_snapshot_id() == parent:
                    raise          # genuine failure, not a commit race
                last_exc = exc     # HEAD moved — retry, but keep the cause
            else:
                shutil.rmtree(batch_dir, ignore_errors=True)  # lost race
            # linear backoff desynchronizes contending writers (every
            # loser otherwise re-reads HEAD at the same instant and the
            # same writer can starve repeatedly)
            time.sleep(0.05 * (attempt + 1))
        # Chain the last swallowed write-phase exception: a DETERMINISTIC
        # failure (bad predicate, corrupt file) that kept coinciding with
        # unrelated concurrent appends would otherwise surface as a bare
        # contention error with the real cause invisible (round-4 advice).
        raise RuntimeError(
            f"{operation} lost the optimistic-commit race "
            f"{max_retries} times; table under heavy write contention"
            + (f" (last write-phase error: {last_exc})" if last_exc
               else "")) from last_exc

    def merge_by_key(self, spark: SparkSession, src: DataFrame,
                     key: str) -> str:
        """MERGE semantics (INSERT OR REPLACE of cache_manager.py:100-111):
        matched target rows are replaced by source rows, unmatched source
        rows are inserted. Anti-join + union rewrite, committed with
        optimistic retry (see _commit_rewrite).

        Schema: allowMissingColumns=True because the target's merged
        schema may carry columns the source lacks (e.g. the appender's
        _batch_id/_query_id bookkeeping) — inserted/kept rows get NULL
        for the other side's missing columns, exactly like SQL MERGE's
        unset columns. Key semantics follow SQL MERGE / Iceberg, not a
        unique index: a NULL source key never matches (SQL NULL
        equality), so NULL-key rows are always INSERTED alongside
        existing NULL-key rows; duplicate keys WITHIN one src batch are
        all inserted (a cardinality Iceberg would reject) — dedupe the
        batch upstream if last-wins is wanted."""
        def df_fn():
            cur_df = self.read(spark)
            if cur_df is None:
                return src
            kept = cur_df.join(src.select(key), key, "left_anti")
            return kept.unionByName(src, allowMissingColumns=True)

        return self._commit_rewrite(df_fn, "merge")

    def delete_where(self, spark: SparkSession, condition) -> str | None:
        """DELETE FROM ... WHERE condition (Iceberg row-delete analogue):
        rewrites the table without matching rows, committed with
        optimistic retry. ``condition`` is a Column or SQL string. No-op
        (returns None) on an empty table.

        Standard SQL DELETE semantics: only rows where the predicate is
        TRUE are removed — rows where it evaluates NULL (e.g. a NULL
        group_id under ``group_id = 3``) are KEPT, exactly as Iceberg's
        ``DELETE FROM`` behaves, so the two backends stay interchangeable
        (a bare ``where(~cond)`` would silently delete NULL-predicate
        rows)."""
        if self.read(spark) is None:
            return None

        def df_fn():
            cur_df = self.read(spark)
            if cur_df is None:          # racer emptied the table mid-retry
                return None
            from pyspark.sql import functions as F
            cond = F.expr(condition) if isinstance(condition, str) \
                else condition
            keep = ~F.coalesce(cond.cast("boolean"), F.lit(False))
            return cur_df.where(keep)

        return self._commit_rewrite(df_fn, "delete")

    def read(self, spark: SparkSession,
             snapshot_id: str | None = None) -> DataFrame | None:
        """Read HEAD, or any retained snapshot by id (time travel —
        Iceberg ``VERSION AS OF`` analogue; snapshots stay readable until
        ``expire_snapshots`` reclaims their files)."""
        if snapshot_id is None:
            snap = self.current_snapshot()
        else:
            with open(os.path.join(self.meta_dir, snapshot_id)) as f:
                snap = json.load(f)
        if snap is None or not snap["files"]:
            return None
        # mergeSchema: a snapshot can span appends with evolving schemas
        # (e.g. the streaming appender's _query_id/_batch_id columns next
        # to a plain batch append); without it Spark infers from ONE
        # sampled footer and silently drops the other files' columns —
        # which would break the appender's replay probe, among others.
        return (spark.read.option("mergeSchema", "true")
                .parquet(*snap["files"]))

    def compact(self, spark: SparkSession, target_files: int = 8) -> str:
        """Small-file compaction (Iceberg ``rewrite_data_files`` analogue).

        Streaming micro-batch appends and per-partition audit writes leave
        a long tail of small files; at warehouse scale that tail dominates
        scan planning time. Rewrites the current snapshot into
        ``target_files`` files and commits the new list atomically —
        readers see either the old file set or the new one, never a mix.
        Old files stay on disk for time-travel until expired."""
        def df_fn():
            cur_df = self.read(spark)
            if cur_df is None:          # racer emptied the table mid-retry
                return None
            return cur_df.repartition(target_files)

        return self._commit_rewrite(df_fn, "compact")

    def expire_snapshots(self, keep: int = 1) -> int:
        """Delete data files referenced ONLY by snapshots older than the
        ``keep`` most recent (Iceberg ``expire_snapshots`` analogue).
        Returns the number of files deleted.

        Runs under the commit lock: the chain walk + deletions must see
        a frozen HEAD, or a commit landing mid-walk could publish a
        snapshot whose files this pass just classified as dead. File
        deletion is pure os.remove — no Spark job, so holding the lock
        is within the sub-second contract. A CONCURRENT in-flight
        rewrite that was reading a now-expired snapshot fails its Spark
        write, sees HEAD moved, and retries against the live HEAD
        (_commit_rewrite); a time-travel reader holding an expired
        snapshot id fails by design, exactly as Iceberg's
        expire_snapshots documents."""
        with self._commit_lock():
            chain = self.history()
            keep_snaps = chain[:keep]
            live: set[str] = set()
            for name in keep_snaps:
                with open(os.path.join(self.meta_dir, name)) as f:
                    live.update(json.load(f)["files"])
            gone: set[str] = set()
            for name in chain[keep:]:
                with open(os.path.join(self.meta_dir, name)) as f:
                    for path in json.load(f)["files"]:
                        if path not in live and path not in gone \
                                and os.path.exists(path):
                            os.remove(path)
                            gone.add(path)
            return len(gone)


class IcebergTable:
    """Same interface over a real Iceberg catalog (needs
    --packages org.apache.iceberg:iceberg-spark-runtime-*)."""

    def __init__(self, identifier: str):
        self.identifier = identifier

    def append(self, df: DataFrame) -> str:
        df.writeTo(self.identifier).append()
        return self.identifier

    def merge_by_key(self, spark: SparkSession, src: DataFrame,
                     key: str) -> str:
        src.createOrReplaceTempView("_merge_src")
        cols = src.columns
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols)
        vals = ", ".join(f"s.{c}" for c in cols)
        spark.sql(f"""
            MERGE INTO {self.identifier} t USING _merge_src s
            ON t.{key} = s.{key}
            WHEN MATCHED THEN UPDATE SET {sets}
            WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) VALUES ({vals})
        """)
        return self.identifier

    def delete_where(self, spark: SparkSession, condition) -> str:
        spark.sql(f"DELETE FROM {self.identifier} WHERE {condition}")
        return self.identifier

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("iceberg").load(self.identifier)


def streaming_query_id(checkpoint_dir: str) -> str:
    """The StreamingQuery's persistent id, read from the checkpoint's
    ``metadata`` json. This is THE id Spark keeps stable across restarts
    from the same checkpoint and regenerates for a fresh checkpoint —
    exactly the dedup scope the docs' (queryId, epochId) exactly-once
    recipe needs. '' when the query hasn't started yet (metadata is
    written at query start, before batch 0 fires)."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f).get("id", "")
    except (FileNotFoundError, json.JSONDecodeError):
        return ""


class IdempotentBatchAppender:
    """At-least-once -> exactly-once adapter for foreachBatch sinks.

    foreachBatch replays a micro-batch after a crash between the table
    append and the streaming checkpoint commit. Appending blindly
    duplicates that batch; re-reading the whole table per batch to probe
    the committed set costs O(files) per trigger. This helper seeds the
    seen set from the table ONCE (covers crash-restart replays, the only
    case an in-memory set misses) and answers later batches from memory.

    Dedup is keyed on (query id, batch id) — Spark's documented
    exactly-once recipe — not batch id alone: epoch ids restart at 0
    for a new checkpoint, so with ``checkpoint_dir`` given, a
    checkpoint reset (new query id) correctly re-admits batch ids an
    OLD incarnation committed, and two different queries can share one
    results table without eating each other's epochs. The query id is
    read lazily from the checkpoint's metadata at first append (it
    exists once the query is running). Without ``checkpoint_dir`` the
    namespace is '' — the pre-round-4 single-query behavior."""

    def __init__(self, table, checkpoint_dir: str | None = None):
        self.table = table
        self._ckpt = checkpoint_dir
        self._ns: str | None = None
        self._seen: set[int] | None = None

    def _namespace(self) -> str:
        if self._ns is None:
            self._ns = (streaming_query_id(self._ckpt)
                        if self._ckpt else "")
        return self._ns

    def _seed(self, spark: SparkSession) -> set[int]:
        df = self.table.read(spark)
        if df is None or "_batch_id" not in df.columns:
            return set()
        from pyspark.sql import functions as F
        if "_query_id" in df.columns:
            # rows from tables predating the query-id column carry NULL
            # after the mergeSchema read; they belong to namespace ''
            df = df.where(F.coalesce(F.col("_query_id"), F.lit(""))
                          == self._namespace())
        # A table with NO _query_id column anywhere predates the
        # namespace scheme entirely (single-query batch-id-only dedup).
        # Seed its batch ids into THIS namespace as a one-time upgrade
        # migration: a crash-restart of the same query straddling the
        # code upgrade must not re-append batches the old incarnation
        # committed (round-4 advice). The legacy-wide seed applies until
        # the first post-upgrade append introduces _query_id (mergeSchema
        # then maps legacy rows to namespace '' above). Attribution of
        # legacy rows is inherently ambiguous, so a CHECKPOINT RESET
        # performed in the same window as the code upgrade must pair with
        # a fresh/compacted results table — otherwise the new query's low
        # batch ids collide with legacy ids and are skipped as replays
        # (we bias toward no-duplicates; the reset+upgrade combination is
        # the operator-documented exception).
        return {r[0] for r in df.select("_batch_id").distinct().collect()}

    def append(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Append unless (query id, batch id) already committed; True if
        written. The seen-check runs BEFORE isEmpty so a replayed batch
        skips without evaluating the (possibly UDF-heavy) batch plan at
        all."""
        if self._seen is None:
            self._seen = self._seed(batch_df.sparkSession)
        if batch_id in self._seen:
            return False
        if batch_df.isEmpty():
            return False
        from pyspark.sql import functions as F
        self.table.append(batch_df
                          .withColumn("_batch_id", F.lit(batch_id))
                          .withColumn("_query_id",
                                      F.lit(self._namespace())))
        self._seen.add(batch_id)
        return True


def have_iceberg(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime is actually on the classpath.

    py4j returns a JavaPackage object (NO exception) for a class it
    cannot resolve, so the old bare attribute probe was always truthy
    and the loud no-runtime ValueError in open_table was dead code; a
    resolvable class comes back as JavaClass instead."""
    try:
        from py4j.java_gateway import JavaClass
        return isinstance(spark._jvm.org.apache.iceberg.Table,  # noqa: SLF001
                          JavaClass)
    except Exception:
        return False


def open_table(spark: SparkSession, location: str):
    """Location routing by FORM, not by what happens to be on the
    classpath: a dotted identifier with no path separators
    ('catalog.db.tbl') is an Iceberg table id (requires the runtime jar);
    a plain posix path -> LocalSnapshotTable. A slash-bearing string
    must never silently flip to an Iceberg identifier just because the
    jar is present.

    URI-scheme locations (s3://, hdfs://, even file://) are REJECTED:
    LocalSnapshotTable's commit machinery is os-level (makedirs/listdir/
    flock), which cannot operate on a URI — it would create a bogus
    local './s3:' tree while Spark writes to the remote store, then
    crash listing it after the (expensive) remote write. Remote object
    stores need the real Iceberg catalog (its CAS commit replaces the
    local flock)."""
    if "://" in location:
        raise ValueError(
            f"{location!r} is a URI; LocalSnapshotTable commits via local "
            f"posix metadata (makedirs/flock) and cannot manage a remote "
            f"store — use an Iceberg catalog identifier for s3/hdfs "
            f"locations, or a plain local path")
    if "/" not in location:
        if have_iceberg(spark):
            return IcebergTable(location)
        raise ValueError(
            f"{location!r} looks like an Iceberg table identifier but no "
            f"Iceberg runtime is on the classpath; pass a filesystem path "
            f"or add --packages org.apache.iceberg:iceberg-spark-runtime-*")
    return LocalSnapshotTable(location)
