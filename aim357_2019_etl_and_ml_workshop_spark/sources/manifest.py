"""Manifest-committed parquet table — the ACID wrapper that turns the
incremental-ingest pieces (IncrementalIngest bookmarks, upsert_snapshot,
snapshot_diff) into a production ingest story (VERDICT r08 next #7).

Design is the published transaction-log pattern (Delta Lake paper, VLDB
2020; Iceberg spec) reduced to its load-bearing core, implemented on
plain files so it works on any filesystem Spark can reach:

- data files are immutable parquet written under ``<root>/data/`` with
  UUID names; a file is INVISIBLE until a manifest version references it,
  so a writer that dies mid-write leaves only unreferenced orphans
  (cleaned by :meth:`ManifestTable.vacuum`), never a torn table.
- a manifest version ``<root>/_manifest/vNNNNNNNNNN.json`` is the FULL
  snapshot: the ordered list of data files plus the application
  transaction watermarks. Readers list the directory, take the highest
  version, and read exactly those files — a reader never observes a
  half-committed version because the version file appears atomically.
- commits are optimistic: the version file is claimed with
  O_CREAT|O_EXCL (atomic on POSIX and on object stores with
  put-if-absent). A concurrent writer that loses the race re-reads the
  new base and retries; blind APPENDs always merge (file lists union),
  so retry is safe; overwrite/upsert retries re-derive from the new base
  snapshot only if the caller's input was version-independent, so those
  surface the conflict instead.
- exactly-once sink semantics use the txn-watermark trick (the Delta
  ``txn`` action): every commit may carry ``(app_id, batch_id)``; a
  commit whose batch_id is <= the table's recorded watermark for that
  app_id is a NO-OP. Spark's foreachBatch is at-least-once — replayed
  batches re-offer the same batch_id, the watermark rejects them, and
  the sink becomes exactly-once across restarts without coordination.

100 TB posture: the manifest is O(files), not O(rows) — with compaction
(sources.io.compact_small_files) keeping files at hundreds of MB, a
100 TB table is ~1e5-1e6 entries, a few MB of JSON read once per query
plan. Every heavy operation (read, upsert's anti-join) is DataFrame
work; the driver touches only the file listing, exactly like the
reference catalog's partition listings. Snapshot isolation is
per-version; there is no row-level conflict detection (copy-on-write
MERGE, the upsert_snapshot plan) — the same trade the real log formats
make for their simplest writers.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer committed the version this transaction targeted."""


class ManifestTable:
    """A versioned, manifest-committed parquet table rooted at ``root``."""

    _V_WIDTH = 10

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifest")

    # -- bootstrap ---------------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, root: str) -> "ManifestTable":
        t = cls(spark, root)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.manifest_dir, exist_ok=True)
        if t.latest_version() is None:
            t._try_commit(0, files=[], txns={})
        return t

    # -- manifest plumbing -------------------------------------------------

    def _version_path(self, v: int) -> str:
        return os.path.join(self.manifest_dir, f"v{v:0{self._V_WIDTH}d}.json")

    def latest_version(self) -> int | None:
        try:
            names = os.listdir(self.manifest_dir)
        except FileNotFoundError:
            return None
        vs = [
            int(n[1 : 1 + self._V_WIDTH])
            for n in names
            if n.startswith("v") and n.endswith(".json")
        ]
        return max(vs) if vs else None

    def _load(self, v: int) -> dict:
        with open(self._version_path(v)) as fh:
            return json.load(fh)

    def _try_commit(
        self,
        v: int,
        files: list[str],
        txns: dict,
        schema: str | None = None,
    ) -> None:
        """Atomically claim version ``v``. O_CREAT|O_EXCL loses cleanly to
        a concurrent committer; the payload is written through a temp file
        + os.replace so a crash mid-write can never leave a torn (and
        therefore reader-visible) version file behind the claimed name."""
        payload = {
            "version": v,
            "files": files,
            "txns": txns,
            "schema": schema,
            "committed_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        path = self._version_path(v)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise CommitConflict(f"version {v} already committed") from exc
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        try:
            with open(tmp, "w") as fh:
                json.dump(payload, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, path)
        finally:
            os.close(fd)
            if os.path.exists(tmp):
                os.remove(tmp)

    def schema_json(self, version: int | None = None) -> str | None:
        """The committed snapshot schema (Spark DataType JSON) at
        ``version`` — None only for the empty bootstrap version."""
        v = self.latest_version() if version is None else version
        return self._load(v).get("schema")

    @staticmethod
    def _check_schema(
        base_schema: str | None, df: DataFrame, allow_evolution: bool
    ) -> str:
        """Appending a mismatched schema would corrupt READS silently
        (a multi-file parquet scan resolves one schema and drops or
        nulls the rest), so the write path is where it must fail. Exact
        match passes; with ``allow_evolution=True`` the new schema may
        ADD NULLABLE fields (existing columns must keep name, type, AND
        nullability) and becomes the table schema; anything else raises.
        Added fields must be nullable because pinned-schema reads of
        pre-evolution files return null for them — a column committed
        non-nullable would then carry nulls that null-intolerant codegen
        is entitled to assume away (ADVICE r09 #2); same reason an
        existing field may not flip nullable->required."""
        from pyspark.sql.types import StructType

        new_json = df.schema.json()
        if base_schema is None or base_schema == new_json:
            return new_json
        old = StructType.fromJson(json.loads(base_schema))
        new = StructType.fromJson(json.loads(new_json))
        old_fields = {f.name: (f.dataType, f.nullable) for f in old.fields}
        new_fields = {f.name: (f.dataType, f.nullable) for f in new.fields}
        compatible = (
            allow_evolution
            and all(
                name in new_fields
                and new_fields[name][0] == dtype
                # required->nullable widening is safe; the reverse is a
                # lie about existing rows
                and (new_fields[name][1] or not was_nullable)
                for name, (dtype, was_nullable) in old_fields.items()
            )
            and all(
                nullable
                for name, (_, nullable) in new_fields.items()
                if name not in old_fields
            )
        )
        if not compatible:
            raise ValueError(
                "schema mismatch vs committed snapshot "
                f"(table: {old.simpleString()}, append: {new.simpleString()})"
                " — pass allow_evolution=True to add nullable columns"
                " (added columns must be nullable: pre-evolution files"
                " read as null in them)"
            )
        return new_json

    # -- write path --------------------------------------------------------

    def _stage_data_files(self, df: DataFrame) -> list[str]:
        """Write ``df`` as new immutable parquet under data/ and return the
        staged file names (relative to root). The files are UNREFERENCED
        until a commit lists them — this is the crash-safety boundary: die
        here and the table is untouched."""
        staged_dir = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.mode("error").parquet(staged_dir)
        out = []
        for name in sorted(os.listdir(staged_dir)):
            if name.endswith(".parquet"):
                out.append(
                    os.path.relpath(
                        os.path.join(staged_dir, name), self.root
                    )
                )
        return out

    def append(
        self,
        df: DataFrame,
        app_id: str | None = None,
        batch_id: int | None = None,
        _staged: list[str] | None = None,
        max_retries: int = 10,
        allow_evolution: bool = False,
    ) -> bool:
        """Append ``df`` as a new version. With ``(app_id, batch_id)`` the
        append is IDEMPOTENT: if the table's committed watermark for
        app_id is already >= batch_id the call is a no-op returning False
        (the replayed-micro-batch case). Returns True when a new version
        was committed. Appends merge trivially, so commit conflicts are
        retried against the fresh base up to ``max_retries`` times."""
        staged = _staged
        for _ in range(max_retries):
            base_v = self.latest_version()
            base = self._load(base_v)
            txns = dict(base.get("txns", {}))
            if app_id is not None:
                done = txns.get(app_id)
                if done is not None and int(done) >= int(batch_id):
                    return False  # replay of an already-committed batch
                txns[app_id] = int(batch_id)
            # re-checked per retry: the schema under evolution is the
            # FRESH base's, not the one this writer first read
            schema = self._check_schema(
                base.get("schema"), df, allow_evolution
            )
            if staged is None:
                staged = self._stage_data_files(df)
            try:
                self._try_commit(
                    base_v + 1,
                    files=base["files"] + staged,
                    txns=txns,
                    schema=schema,
                )
                return True
            except CommitConflict:
                continue  # re-read the new base; staged files stay valid
        raise CommitConflict(
            f"append lost {max_retries} commit races at {self.root}"
        )

    def overwrite(
        self,
        df: DataFrame,
        app_id: str | None = None,
        batch_id: int | None = None,
    ) -> bool:
        """Replace the snapshot with ``df`` (copy-on-write). Same
        idempotence contract as append; NOT conflict-retried — an
        overwrite derived from a stale base must surface the race, not
        silently clobber the interleaved commit."""
        base_v = self.latest_version()
        base = self._load(base_v)
        txns = dict(base.get("txns", {}))
        if app_id is not None:
            done = txns.get(app_id)
            if done is not None and int(done) >= int(batch_id):
                return False
            txns[app_id] = int(batch_id)
        staged = self._stage_data_files(df)
        self._try_commit(
            base_v + 1, files=staged, txns=txns, schema=df.schema.json()
        )
        return True

    def upsert(
        self,
        updates: DataFrame,
        key_cols: list[str],
        app_id: str | None = None,
        batch_id: int | None = None,
    ) -> bool:
        """Keyed latest-wins MERGE: current snapshot anti-joined against
        the update keys, unioned with the updates, committed as a new
        snapshot (operators.canonicalize.upsert_snapshot — the plan a log
        format's copy-on-write MERGE lowers to). Idempotent under
        ``(app_id, batch_id)`` like append."""
        from ..operators.canonicalize import upsert_snapshot

        base_v = self.latest_version()
        if app_id is not None:
            done = self._load(base_v).get("txns", {}).get(app_id)
            if done is not None and int(done) >= int(batch_id):
                return False
        merged = upsert_snapshot(self.read(version=base_v), updates, key_cols)
        return self.overwrite(merged, app_id=app_id, batch_id=batch_id)

    def delete(
        self,
        predicate: str | Column,
        app_id: str | None = None,
        batch_id: int | None = None,
        max_retries: int = 5,
    ) -> dict:
        """Row-level DELETE WHERE ``predicate`` — copy-on-write rewriting
        ONLY the files that contain matching rows (r12, VERDICT r11 #2:
        the right-to-be-forgotten operation every training-corpus store
        needs). Returns a stats dict: ``{"committed": bool,
        "files_total": int, "files_rewritten": int, "rows_deleted": int,
        "version": int | None}``.

        File pruning is real, not heuristic: ONE discovery scan groups
        matched rows by ``input_file_name()`` with the predicate pushed
        into the parquet scan, so Spark's row-group min/max skipping
        decides which files are even opened — after a z-ordered
        :meth:`compact` the matched-file set for a selective predicate is
        a small fraction of the table, and only THOSE files are
        rewritten. SQL DELETE semantics: rows where the predicate is
        NULL are KEPT (only TRUE deletes), enforced via
        ``NOT coalesce(pred, FALSE)`` on the rewrite side.

        Commit protocol mirrors :meth:`compact`: the rewrite stages
        invisible, interleaved APPENDs merge on retry (their files are
        untouched), and a concurrent overwrite/upsert/compact that
        removed a matched file surfaces as :class:`CommitConflict` —
        deleting from a stale base must never resurrect rewritten rows.
        Idempotent under ``(app_id, batch_id)`` like append."""
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        base_v = self.latest_version()
        base = self._load(base_v)
        stats = {
            "committed": False,
            "files_total": len(base["files"]),
            "files_rewritten": 0,
            "rows_deleted": 0,
            "version": None,
        }
        if app_id is not None:
            done = base.get("txns", {}).get(app_id)
            if done is not None and int(done) >= int(batch_id):
                return stats
        if not base["files"]:
            return stats
        snap = self.read(version=base_v)
        # discovery: which committed files hold TRUE-matching rows, and
        # how many — predicate pushdown makes this a stats-pruned scan
        hits = (
            snap.where(cond)
            .groupBy(F.input_file_name().alias("_f"))
            .count()
            .collect()
        )
        if not hits:
            return stats
        by_abs = {
            os.path.abspath(os.path.join(self.root, f)): f
            for f in base["files"]
        }
        hit_rel: list[str] = []
        for r in hits:
            p = os.path.abspath(unquote(urlparse(r["_f"]).path))
            if p not in by_abs:
                raise CommitConflict(
                    f"matched file {p} not in base version {base_v} of "
                    f"{self.root} — concurrent rewrite during delete"
                )
            hit_rel.append(by_abs[p])
        stats["rows_deleted"] = int(sum(r["count"] for r in hits))
        stats["files_rewritten"] = len(hit_rel)
        # rewrite ONLY the matched files, keeping NULL-predicate rows
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(base["schema"]))
        survivors = (
            self.spark.read.schema(schema)
            .parquet(*[os.path.join(self.root, f) for f in hit_rel])
            .where(~F.coalesce(cond, F.lit(False)))
        )
        staged = self._stage_data_files(survivors)
        old = set(hit_rel)
        for _ in range(max_retries):
            cur_v = self.latest_version()
            cur = self._load(cur_v)
            if not old.issubset(cur["files"]):
                raise CommitConflict(
                    f"snapshot rewritten during delete at {self.root}"
                )
            txns = dict(cur.get("txns", {}))
            if app_id is not None:
                txns[app_id] = int(batch_id)
            files = [f for f in cur["files"] if f not in old] + staged
            try:
                self._try_commit(
                    cur_v + 1,
                    files=files,
                    txns=txns,
                    schema=cur.get("schema"),
                )
                stats["committed"] = True
                stats["version"] = cur_v + 1
                return stats
            except CommitConflict:
                continue
        raise CommitConflict(
            f"delete lost {max_retries} commit races at {self.root}"
        )

    def changes_between(
        self, v_from: int, v_to: int, key_cols: list[str]
    ) -> DataFrame:
        """Change data feed between two committed versions: one row per
        changed key with change_type in ('insert', 'delete', 'update') —
        operators.canonicalize.snapshot_diff composed with the version
        log (r12, VERDICT r11 #2: downstream-incremental consumption).

        Reads O(delta), not O(table): data files are immutable, so only
        files REFERENCED BY EXACTLY ONE side can contribute changes —
        rows in shared files are identical on both sides and would
        cancel in the diff anyway. The old side is the files only in
        ``v_from``, the new side the files only in ``v_to``; under the
        key-unique-snapshot contract snapshot_diff already assumes, the
        restricted diff equals the full-snapshot diff. An append-only
        delta therefore reads just the appended files and emits pure
        inserts; a delete reads the rewritten files and their
        replacements."""
        if v_from == v_to:
            raise ValueError("changes_between needs two distinct versions")
        m_from, m_to = self._load(v_from), self._load(v_to)
        only_from = [f for f in m_from["files"] if f not in set(m_to["files"])]
        only_to = [f for f in m_to["files"] if f not in set(m_from["files"])]

        from pyspark.sql.types import StructType

        from ..operators.canonicalize import snapshot_diff

        def side(files: list[str], schema_json: str | None) -> DataFrame:
            schema = StructType.fromJson(json.loads(schema_json))
            if not files:
                return self.spark.createDataFrame([], schema)
            return self.spark.read.schema(schema).parquet(
                *[os.path.join(self.root, f) for f in files]
            )

        return snapshot_diff(
            side(only_from, m_from.get("schema") or m_to.get("schema")),
            side(only_to, m_to.get("schema") or m_from.get("schema")),
            key_cols,
        )

    def restore(self, version: int, max_retries: int = 10) -> int:
        """Roll the table back to ``version`` by committing a NEW version
        whose file list and schema are the old snapshot's (the Delta
        RESTORE shape, r12): history stays intact — the bad versions
        remain time-travelable until vacuum — and readers flip
        atomically. Data files are immutable and still on disk (vacuum
        retention permitting), so restore moves no bytes. txn watermarks
        are carried FORWARD from the current version, not the restored
        one: exactly-once replay protection must survive a rollback, or
        a restarted stream would double-apply every batch since
        ``version``. Conflict-retried like append (restore targets a
        version by NUMBER, so a concurrent commit doesn't invalidate
        it). Returns the new version number."""
        target = self._load(version)
        for _ in range(max_retries):
            cur_v = self.latest_version()
            cur = self._load(cur_v)
            try:
                self._try_commit(
                    cur_v + 1,
                    files=list(target["files"]),
                    txns=dict(cur.get("txns", {})),
                    schema=target.get("schema"),
                )
                return cur_v + 1
            except CommitConflict:
                continue
        raise CommitConflict(
            f"restore lost {max_retries} commit races at {self.root}"
        )

    def history(self) -> list[dict]:
        """The version log, oldest first: one dict per committed version
        with version / n_files / txns / committed_at (DESCRIBE HISTORY).
        Driver-side file-listing only — O(versions), no data read."""
        latest = self.latest_version()
        out = []
        for v in range(0, (latest or 0) + 1):
            path = self._version_path(v)
            if not os.path.exists(path):
                continue
            m = self._load(v)
            out.append(
                {
                    "version": v,
                    "n_files": len(m.get("files", [])),
                    "txns": dict(m.get("txns", {})),
                    "committed_at": m.get("committed_at"),
                }
            )
        return out

    # -- read path ----------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """The snapshot DataFrame at ``version`` (default: latest). Reads
        exactly the committed file list — orphans from crashed writers are
        invisible by construction. Empty tables need a schema source, so
        they return an empty frame only once a first append defined one."""
        v = self.latest_version() if version is None else version
        m = self._load(v)
        if not m["files"]:
            raise ValueError(
                f"version {v} of {self.root} is empty — append first"
            )
        paths = [os.path.join(self.root, f) for f in m["files"]]
        reader = self.spark.read
        if m.get("schema"):
            # pin the committed snapshot schema: after an evolved append,
            # files written before the new column read as null instead of
            # whichever file's schema the scan happened to resolve
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(m["schema"])))
        return reader.parquet(*paths)

    def txn_watermark(self, app_id: str) -> int | None:
        v = self.latest_version()
        done = self._load(v).get("txns", {}).get(app_id)
        return None if done is None else int(done)

    # -- maintenance ---------------------------------------------------------

    def compact(
        self,
        target_file_bytes: int = 128 << 20,
        max_retries: int = 5,
        zorder_by: list[str] | None = None,
        zorder_bits: int = 12,
        zorder_mapping: str = "linear",
    ) -> bool:
        """Rewrite the current snapshot's small files into
        ``ceil(total_bytes / target_file_bytes)`` balanced files and commit
        the swap as a new version — the maintenance half of the streaming
        ingest story (per-micro-batch appends make files, compaction keeps
        the manifest O(total/target) instead of O(batches); the published
        log formats call this OPTIMIZE / rewrite_data_files).

        ``zorder_by=[col, ...]`` (r11, VERDICT r10 #2 — OPTIMIZE ZORDER on
        the ACID table): the rewrite is laid out with the interleaved
        Morton key instead of a plain repartition — range-partitioned AND
        locally sorted on the key (sources.io.with_zorder_key semantics,
        incl. ``zorder_bits`` / ``zorder_mapping='rank'`` for heavy-tailed
        columns), so the committed files carry narrow min/max stats on
        EVERY z-column. All commit guarantees are unchanged: the rewrite
        stages invisible, the committed schema stays pinned, interleaved
        appends are re-laid on retry (the appended delta keeps its own
        layout until the next z-ordered compaction — same as Delta's
        OPTIMIZE), and a z-ordered compaction always commits even when the
        file count is already at target (the LAYOUT is the point, not the
        count).

        Concurrency contract: compaction races are resolved like append
        races, because compaction only REPLACES the base version's file
        set. If a concurrent APPEND lands first, the retry re-lays the
        appended delta (new files minus the compacted base set) on top of
        the staged rewrite — contents identical, no re-stage. If a
        concurrent OVERWRITE/UPSERT removed any base file, the staged
        rewrite describes a snapshot that no longer exists; that surfaces
        as :class:`CommitConflict` (the same stale-base rule overwrite
        itself follows). Readers are never disturbed: old versions stay
        readable for time travel until :meth:`vacuum` reclaims them.

        Returns False (no commit) when the table is empty or — in plain
        (non-zorder) mode — already at or below the target file count."""
        import math

        base_v = self.latest_version()
        base = self._load(base_v)
        if not base["files"]:
            return False
        total = sum(
            os.path.getsize(os.path.join(self.root, f))
            for f in base["files"]
        )
        n_out = max(1, math.ceil(total / target_file_bytes))
        if zorder_by is None and n_out >= len(base["files"]):
            return False
        snap = self.read(version=base_v)
        if zorder_by is not None:
            from .io import with_zorder_key

            # the zordered-sink shape (io.write_parquet_zordered) routed
            # through the staging/commit path: disjoint key ranges per
            # staged file, key never reaches the files
            keyed = with_zorder_key(
                snap, zorder_by, bits=zorder_bits, mapping=zorder_mapping
            )
            laid = (
                keyed.repartitionByRange(n_out, "_zkey")
                .sortWithinPartitions("_zkey")
                .drop("_zkey")
            )
        else:
            # repartition (not coalesce): balanced outputs regardless of
            # the append history's file-size skew; one shuffle of data
            # being rewritten anyway
            laid = snap.repartition(n_out)
        staged = self._stage_data_files(laid)
        old = set(base["files"])
        for _ in range(max_retries):
            cur_v = self.latest_version()
            cur = self._load(cur_v)
            if not old.issubset(cur["files"]):
                raise CommitConflict(
                    f"snapshot rewritten during compaction of {self.root}"
                )
            files = staged + [f for f in cur["files"] if f not in old]
            try:
                self._try_commit(
                    cur_v + 1,
                    files=files,
                    txns=dict(cur.get("txns", {})),
                    schema=cur.get("schema"),
                )
                return True
            except CommitConflict:
                continue
        raise CommitConflict(
            f"compaction lost {max_retries} commit races at {self.root}"
        )

    def vacuum(
        self, retain_versions: int = 1, grace_seconds: float = 3600.0
    ) -> list[str]:
        """Delete data files referenced by NO retained version (the last
        ``retain_versions`` manifests stay readable for time travel).
        Orphans from crashed writers are the main customers. Returns the
        deleted paths (relative).

        ``grace_seconds`` is the writer-vs-vacuum guard (the Delta
        retention pattern; ADVICE r09 #3): append/upsert/compact all
        STAGE data files unreferenced and only then commit, so an
        unreferenced file younger than any plausible stage-to-commit
        window may belong to an IN-FLIGHT transaction — deleting it
        would make that writer commit a version referencing missing
        files, bricking the table's latest snapshot. Files younger than
        the grace period are skipped (mtime-based, like Delta's
        deletedFileRetentionDuration). Pass ``grace_seconds=0`` only
        when no writer can be concurrent (tests, single-writer batch
        jobs between runs)."""
        latest = self.latest_version()
        keep_versions = range(
            max(0, latest - retain_versions + 1), latest + 1
        )
        referenced: set[str] = set()
        for v in keep_versions:
            referenced.update(self._load(v)["files"])
        cutoff = time.time() - grace_seconds
        deleted = []
        for dirpath, _dirnames, filenames in os.walk(self.data_dir):
            for name in filenames:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, self.root)
                if name.endswith(".parquet") and rel not in referenced:
                    # a concurrent vacuum/cleaner may remove the file
                    # between os.walk and the stat — already-gone means
                    # someone else vacuumed it, not an error
                    try:
                        if os.path.getmtime(full) <= cutoff:
                            os.remove(full)
                            deleted.append(rel)
                    except FileNotFoundError:
                        continue
        return sorted(deleted)


def exactly_once_writer(table: ManifestTable, app_id: str):
    """foreachBatch sink closure with exactly-once semantics: Structured
    Streaming replays micro-batches at-least-once after a crash, but the
    replay carries the SAME batch_id — the table's txn watermark turns
    the duplicate into a no-op. Usage:

        q = (df.writeStream.foreachBatch(
                 exactly_once_writer(table, app_id="nightly-ingest"))
             .option("checkpointLocation", ckpt).trigger(availableNow=True)
             .start())
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        table.append(batch_df, app_id=app_id, batch_id=int(batch_id))

    return write
