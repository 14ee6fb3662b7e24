"""Snapshot-committed tables: a minimal Iceberg-style table format.

The north rule requires the pipeline to be "resumable from an
Iceberg-snapshot checkpoint so a killed run restarts at the last committed
partition". Plain ``_SUCCESS``-gated parquet directories approximate that,
but directory listing cannot distinguish a torn append from a committed one.
This module implements the actual Iceberg core property on top of parquet,
with no external dependency:

  * every commit writes data files into a fresh ``data/snap-<uuid>/``
    directory, THEN publishes a JSON manifest listing the table's exact
    file set via an atomic hard-link rename — readers resolve the manifest,
    never the directory, so a crashed writer is invisible;
  * manifests are versioned and immutable: appends create a new version
    whose file list extends the parent's, old versions stay readable
    (time travel), and ``rollback`` is just a new manifest pointing at an
    old file list;
  * concurrent committers race on the version-file creation (hard links
    fail atomically if the target exists) and retry against the new head —
    Iceberg's optimistic concurrency, scaled down;
  * ``vacuum`` deletes data directories no manifest references (crash
    leftovers / rolled-back snapshots).

On a real cluster the same call sites swap to ``format("iceberg")`` +
``MERGE INTO``; the semantics the pipeline depends on — atomic visibility,
last-committed-snapshot resume, per-snapshot lineage metrics — are identical
by construction. Reference parity: nabu's incremental hash-skip
(/root/reference/internal/crawl/hash_checks/hash_check.go:34-122) restarts
from what the object store already holds; here "what the store holds" is the
last committed snapshot rather than a bucket listing.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed the same version; retried past the limit."""


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # --- manifest plumbing ---------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version:06d}.json")

    def latest_version(self) -> int | None:
        # int(name[1:-5]) — strip 'v' and '.json' — so versions beyond the
        # %06d-formatted width (>= 1000000) still resolve correctly
        versions = [
            int(name[1:-5])
            for name in os.listdir(self.manifest_dir)
            if name.startswith("v") and name.endswith(".json")
        ]
        return max(versions) if versions else None

    def manifest(self, version: int | None = None) -> dict | None:
        if version is None:
            version = self.latest_version()
            if version is None:
                return None
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        out = []
        v = self.latest_version()
        while v is not None:
            m = self.manifest(v)
            out.append(
                {
                    k: m[k]
                    for k in (
                        "version",
                        "parent",
                        "operation",
                        "stage",
                        "row_count",
                        "committed_at",
                        "metrics",
                    )
                }
            )
            v = m["parent"]
        return out

    def _publish(self, manifest: dict, *, max_retries: int = 20) -> int:
        """Atomically publish a manifest at the next free version via
        hard-link creation (fails if the version exists — the optimistic
        concurrency point). On collision, re-resolve the head, reparent,
        and retry."""
        for _ in range(max_retries):
            head = self.latest_version()
            version = (head or 0) + 1 if head is not None else 1
            manifest = dict(manifest)
            manifest["version"] = version
            manifest["parent"] = head
            if manifest["operation"] == "append" and head is not None:
                parent_files = self.manifest(head)["files"]
                manifest["files"] = parent_files + manifest["new_files"]
            else:
                manifest["files"] = list(manifest["new_files"])
            tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh, indent=1)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, self._manifest_path(version))
                return version
            except FileExistsError:
                continue  # lost the race: reparent on the new head and retry
            finally:
                os.unlink(tmp)
        raise CommitConflict(
            f"could not commit after {max_retries} attempts at {self.root}"
        )

    # --- public API ----------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        *,
        operation: str = "append",
        stage: str | None = None,
        metrics: dict | None = None,
    ) -> int:
        """Write ``df``'s rows as parquet data files, then publish them in a
        new snapshot. Nothing is visible to readers until the manifest
        lands; a crash before that leaves only unreferenced data files
        (reclaimable with ``vacuum``)."""
        if operation not in ("append", "overwrite"):
            raise ValueError(f"unknown operation {operation!r}")
        snap_dir = os.path.join(self.data_dir, f"snap-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(snap_dir)
        files = sorted(
            os.path.join(snap_dir, f)
            for f in os.listdir(snap_dir)
            if f.endswith(".parquet")
        )
        row_count = _parquet_rows(files)
        manifest = {
            "operation": operation,
            "stage": stage,
            "new_files": files,
            "row_count": row_count,
            "metrics": metrics or {},
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        }
        return self._publish(manifest)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The table at ``version`` (default: latest committed). Reads the
        manifest's exact file list — never a directory listing — so torn
        writes are invisible by construction."""
        m = self.manifest(version)
        if m is None or not m["files"]:
            raise FileNotFoundError(
                f"no committed snapshot at {self.root}"
                + (f" version {version}" if version is not None else "")
            )
        return spark.read.parquet(*m["files"])

    def exists(self) -> bool:
        return self.latest_version() is not None

    def rollback(self, version: int) -> int:
        """Publish a new snapshot whose file list equals an older one's —
        history stays intact (Iceberg rollback semantics)."""
        old = self.manifest(version)
        if old is None:
            raise FileNotFoundError(f"no snapshot v{version} at {self.root}")
        manifest = {
            "operation": "overwrite",
            "stage": old.get("stage"),
            "new_files": old["files"],
            "row_count": old["row_count"],
            # carry the target's metrics forward: sequence counters (e.g.
            # GraphStore's max_seq) must keep counting from the restored
            # state or later delta rows would lose the max_by merge
            "metrics": {**(old.get("metrics") or {}),
                        "rolled_back_to": version},
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        }
        return self._publish(manifest)

    def vacuum(self, *, min_age_seconds: float = 3600.0) -> list[str]:
        """Delete data directories referenced by NO manifest (crash debris,
        discarded concurrent writes). Returns the removed directories.

        Only directories whose mtime is older than ``min_age_seconds`` are
        removed — Iceberg's orphan-file age guard: a concurrent committer's
        freshly written snap-<uuid> dir is unreferenced only for the window
        between its parquet write and its manifest publish, so an age gate
        keeps vacuum safe to run beside live commits."""
        referenced: set[str] = set()
        all_versions = [
            int(name[1:-5])
            for name in os.listdir(self.manifest_dir)
            if name.startswith("v") and name.endswith(".json")
        ]
        for v in all_versions:
            for f in self.manifest(v)["files"]:
                referenced.add(os.path.dirname(f))
        removed = []
        import shutil

        cutoff = time.time() - min_age_seconds
        for d in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, d)
            if full not in referenced and os.path.getmtime(full) < cutoff:
                shutil.rmtree(full)
                removed.append(full)
        return removed


def _parquet_rows(files: list[str]) -> int:
    """Row count from parquet footers — local metadata, no Spark job (the
    writer-side stats Iceberg keeps in its manifests)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


# --- snapshot-committed pipeline ---------------------------------------------


def run_pipeline_snapshots(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    num_partitions: int | None = None,
    salt: bool = True,
) -> dict:
    """The ``pipeline.run_pipeline`` stage graph with every stage committed
    to a SnapshotTable: extract -> docs table, toRdf -> quads table, plus a
    lineage table. A killed run restarts from the last committed snapshot
    (anti-join on what it already holds), exactly once per input row; each
    commit carries its stage's lineage metrics in the manifest."""
    from .operators.extract import extract_docs, with_object_key
    from .operators.triples import docs_to_quads, failures_by_host, quads_only
    from .pipeline import with_prov_key
    from pyspark.sql import functions as F

    docs_tbl = SnapshotTable(os.path.join(out_dir, "docs_tbl"))
    quads_tbl = SnapshotTable(os.path.join(out_dir, "quads_tbl"))
    lineage_tbl = SnapshotTable(os.path.join(out_dir, "lineage_tbl"))

    t0 = time.monotonic()
    if docs_tbl.exists():
        existing = docs_tbl.read(spark)
        todo = pages.join(existing.select("url"), "url", "left_anti")
        if not todo.isEmpty():
            docs_new = with_object_key(
                extract_docs(todo, num_partitions=num_partitions, salt=salt)
            )
            docs_tbl.commit(
                docs_new,
                operation="append",
                stage="extract",
                metrics={"seconds": round(time.monotonic() - t0, 3)},
            )
    else:
        docs_new = with_object_key(
            extract_docs(pages, num_partitions=num_partitions, salt=salt)
        )
        docs_tbl.commit(
            docs_new,
            operation="overwrite",
            stage="extract",
            metrics={"seconds": round(time.monotonic() - t0, 3)},
        )
    docs = docs_tbl.read(spark)

    t1 = time.monotonic()
    if quads_tbl.exists():
        done_provs = quads_tbl.read(spark).select("prov").distinct()
        todo_docs = (
            with_prov_key(docs).join(done_provs, "prov", "left_anti").drop("prov")
        )
        if not todo_docs.isEmpty():
            quads_tbl.commit(
                docs_to_quads(todo_docs),
                operation="append",
                stage="docs_to_quads",
                metrics={"seconds": round(time.monotonic() - t1, 3)},
            )
    else:
        quads_tbl.commit(
            docs_to_quads(docs),
            operation="overwrite",
            stage="docs_to_quads",
            metrics={"seconds": round(time.monotonic() - t1, 3)},
        )
    raw_quads = quads_tbl.read(spark)

    lineage = (
        failures_by_host(raw_quads, stage="docs_to_quads")
        .join(
            docs.groupBy(F.col("host").alias("partition_key")).agg(
                F.count("*").alias("urls_in")
            ),
            "partition_key",
            "left",
        )
    )
    # overwrite, not append: lineage is recomputed over ALL raw_quads each
    # run, so appending would leave N duplicated copies after N resumes
    lineage_tbl.commit(lineage, operation="overwrite", stage="lineage")

    return {
        "docs": docs,
        "quads": quads_only(raw_quads),
        "raw_quads": raw_quads,
        "lineage": lineage_tbl.read(spark),
        "tables": {"docs": docs_tbl, "quads": quads_tbl, "lineage": lineage_tbl},
    }
