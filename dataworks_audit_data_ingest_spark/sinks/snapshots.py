"""Snapshot-isolated table commits with time travel — a minimal manifest
layer over the parquet sinks, following the published lakehouse design
(Iceberg's snapshot/manifest lists, Delta's transaction log): readers never
list directories, they read the exact file set a committed manifest names,
and writers make new data visible with ONE atomic pointer swap.

Why this matters at 100 TB: directory listing on an object store is slow,
eventually consistent, and — worse — sees half-written output while a job
is running. With a manifest, a 1000-executor write job can spend hours
producing files, and none of them exist to readers until the final HEAD
rename; a crashed job leaves only orphans (reclaimed by ``vacuum``), never
a torn table. Time travel and rollback fall out for free: every commit is
a full file-list manifest, so "the table as of snapshot 7" is just a
different manifest to read.

Layout under the table root::

    data/commit-<id>-<nonce>/part-*.parquet   -- immutable once written
    manifests/snap-<id>.json                  -- full file list + schema
    _HEAD                                     -- current snapshot id (atomic rename)

Concurrency is optimistic single-table: a commit records the HEAD it
started from and refuses to swap if HEAD moved (``SnapshotConflict``) —
the loser re-reads and retries, as in Iceberg's commit protocol. On a
POSIX filesystem the final ``os.replace`` is atomic; on an object store
the same role is played by a conditional put, a deliberate deployment
detail outside this module.

This is an engine-level sink (no reference analog — the reference's sink
is write-once S3 objects, `audit_data_ingest.py:172-186`; idempotent
re-runs there come from key overwrite, here from snapshot isolation).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SnapshotConflict(RuntimeError):
    """Another commit moved HEAD while this one was writing."""


class SnapshotTable:
    """A parquet table whose visible state is a committed manifest."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)

    # -- pointer ---------------------------------------------------------

    def _head_path(self) -> str:
        return os.path.join(self.path, "_HEAD")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._head_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _swap_head(self, snapshot_id: int, expected_parent: int | None) -> None:
        if self.current_snapshot_id() != expected_parent:
            raise SnapshotConflict(
                f"HEAD moved (expected {expected_parent}, "
                f"found {self.current_snapshot_id()}); retry the commit"
            )
        tmp = self._head_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(tmp, self._head_path())  # the one atomic step

    # -- manifests -------------------------------------------------------

    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.path, "manifests", f"snap-{snapshot_id}.json")

    def _read_manifest(self, snapshot_id: int) -> dict:
        try:
            with open(self._manifest_path(snapshot_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot {snapshot_id} does not exist (never committed, "
                f"or expired by vacuum)"
            ) from None

    def snapshots(self) -> list[dict]:
        """Committed history, oldest first (reachable manifests only)."""
        out = []
        sid = self.current_snapshot_id()
        while sid is not None:
            m = self._read_manifest(sid)
            out.append(m)
            sid = m["parent"]
        return list(reversed(out))

    # -- commits ---------------------------------------------------------

    def _write_data(self, df: DataFrame, snapshot_id: int) -> list[str]:
        sub = f"commit-{snapshot_id}-{uuid.uuid4().hex[:8]}"
        target = os.path.join(self.path, "data", sub)
        df.write.mode("error").parquet(target)
        return sorted(
            os.path.join("data", sub, name)
            for name in os.listdir(target)
            if name.endswith(".parquet") and not name.startswith(".")
        )

    def _commit(
        self, df: DataFrame, operation: str, properties: dict | None = None
    ) -> int:
        parent = self.current_snapshot_id()
        snapshot_id = (parent + 1) if parent is not None else 0
        new_files = self._write_data(df, snapshot_id)
        if operation == "append" and parent is not None:
            files = self._read_manifest(parent)["files"] + new_files
        else:
            files = new_files
        manifest = {
            "snapshot_id": snapshot_id,
            "parent": parent,
            "operation": operation,
            "files": files,
            "schema": df.schema.json(),
            "committed_at": time.time(),
            "properties": properties or {},
        }
        # Manifest lands fully before HEAD moves: a crash between the two
        # leaves readers on the parent snapshot and only orphan files
        # behind (vacuum's job) — never a torn table.
        with open(self._manifest_path(snapshot_id), "w") as f:
            json.dump(manifest, f)
        self._swap_head(snapshot_id, parent)
        return snapshot_id

    def commit_append(self, df: DataFrame, properties: dict | None = None) -> int:
        """Make ``df``'s rows visible atomically alongside existing data.
        ``properties`` are free-form strings stored on the manifest (e.g.
        a streaming batch id for replay idempotency)."""
        return self._commit(df, "append", properties)

    def commit_overwrite(self, df: DataFrame, properties: dict | None = None) -> int:
        """Atomically replace the table contents with ``df``."""
        return self._commit(df, "overwrite", properties)

    def find_snapshot_by_property(self, key: str, value: str) -> dict | None:
        """Newest reachable manifest whose properties carry key=value
        (how a replayed streaming micro-batch discovers it already
        committed). O(history length) walk — production tables keep a
        side index; at vacuum-bounded history depth the walk is fine."""
        for m in reversed(self.snapshots()):
            if m.get("properties", {}).get(key) == value:
                return m
        return None

    def rollback(self, snapshot_id: int) -> int:
        """Commit a NEW snapshot whose file list equals an old one's —
        history is preserved (Iceberg-style rollback, not history rewrite).
        """
        old = self._read_manifest(snapshot_id)
        parent = self.current_snapshot_id()
        new_id = (parent + 1) if parent is not None else 0
        manifest = {
            "snapshot_id": new_id,
            "parent": parent,
            "operation": f"rollback-to-{snapshot_id}",
            "files": old["files"],
            "schema": old["schema"],
            "committed_at": time.time(),
        }
        with open(self._manifest_path(new_id), "w") as f:
            json.dump(manifest, f)
        self._swap_head(new_id, parent)
        return new_id

    # -- reads -----------------------------------------------------------

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """The table as of a snapshot (default: current HEAD). Reads the
        manifest's exact file list — no directory listing, no visibility
        of in-flight commits."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            raise ValueError("table has no committed snapshot yet")
        m = self._read_manifest(sid)
        schema = StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.path, rel) for rel in m["files"]]
        return spark.read.schema(schema).parquet(*paths)

    # -- maintenance -----------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop history: keep the newest ``keep_last`` reachable snapshots,
        delete every manifest and data file nothing kept references
        (orphans from crashed commits included). Returns deleted paths."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        chain = self.snapshots()
        kept = chain[-keep_last:]
        live = {rel for m in kept for rel in m["files"]}
        kept_ids = {m["snapshot_id"] for m in kept}
        deleted: list[str] = []
        data_root = os.path.join(self.path, "data")
        for sub in sorted(os.listdir(data_root)):
            subdir = os.path.join(data_root, sub)
            for name in sorted(os.listdir(subdir)):
                rel = os.path.join("data", sub, name)
                if rel not in live:
                    os.remove(os.path.join(subdir, name))
                    deleted.append(rel)
            if not os.listdir(subdir):
                os.rmdir(subdir)
        man_root = os.path.join(self.path, "manifests")
        for name in sorted(os.listdir(man_root)):
            sid = int(name.removeprefix("snap-").removesuffix(".json"))
            if sid not in kept_ids:
                os.remove(os.path.join(man_root, name))
                deleted.append(os.path.join("manifests", name))
        # Re-parent the oldest kept manifest so the chain stays walkable.
        oldest = kept[0]
        if oldest["parent"] is not None:
            oldest = dict(oldest, parent=None)
            with open(self._manifest_path(oldest["snapshot_id"]), "w") as f:
                json.dump(oldest, f)
        return deleted
