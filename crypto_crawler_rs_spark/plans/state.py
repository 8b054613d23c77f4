"""Snapshot state store — Iceberg-style commit semantics on plain
parquet.

The reference has NO durable state: a crash loses the subscribed-set
and relies on pm2 restarting the process
(crypto-crawler/src/crawlers/utils.rs:557-561).  The north rule makes
durability a requirement: state checkpoints every round and a killed
job resumes exactly.

This sandbox has no Iceberg runtime jar, so we reproduce the part of
Iceberg we rely on — atomic snapshot commits over immutable files —
directly:

* every round writes its outputs under ``rounds/{round:06d}/...``
  (immutable once written);
* a ``manifest.json`` names the CURRENT snapshot: the latest
  frontier/host_state paths and the explicit list of fetched / seen /
  metrics delta directories that are part of the table;
* the manifest is committed by write-temp + ``os.replace`` (atomic on
  POSIX).  A crash mid-round leaves orphan directories that no
  manifest references — readers never see them, so replaying the
  round is idempotent (exactly-once append semantics).

On a real cluster the same class runs against an Iceberg catalog by
swapping ``_read``/``_write`` for ``spark.table``/``writeTo`` — the
round loop does not change (recorded as a config switch per
SURVEY.md §7.1).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class StateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict[str, Any] | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as f:
            return json.load(f)

    def commit(self, manifest: dict[str, Any]) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic snapshot swap

    # -- round-scoped writes ------------------------------------------
    def round_dir(self, rnd: int, name: str) -> str:
        return os.path.join(self.root, "rounds", f"{rnd:06d}", name)

    def write(
        self,
        df: DataFrame,
        rnd: int,
        name: str,
        partitions: int | None = None,
        partition_by: str | None = None,
    ) -> str:
        path = self.round_dir(rnd, name)
        w = df.repartition(partitions) if partitions else df
        writer = w.write.mode("overwrite")
        if partition_by:
            # hive-style bucket directories (bucket=K/...) — the plain
            # -parquet stand-in for an Iceberg bucket transform; lets
            # readers prune to one bucket's files without a shuffle
            writer = writer.partitionBy(partition_by)
        writer.parquet(path)
        if partition_by and not self._readable(path):
            # an EMPTY partitioned write emits zero data files (hive
            # layout has no dir to carry the schema), which breaks
            # every downstream read (spark unable-to-infer-schema,
            # pyarrow no-files).  All-waiting rounds (crawl_delay >= 2,
            # everyone backing off) make empty deltas routine, so fall
            # back to a non-partitioned empty file that carries the
            # schema; bucket readers already tolerate missing
            # bucket=K/ dirs.  (Iceberg tables carry schema in
            # metadata — this guard is parquet-stand-in-only.)
            df.limit(0).write.mode("overwrite").parquet(path)
        return path

    def _readable(self, path: str) -> bool:
        """True iff a parquet read of ``path`` can infer a schema.
        Probed THROUGH Spark (not a local os.walk) so the check holds
        on any default filesystem — a driver-local directory scan
        would see nothing on HDFS/S3 and the empty-write fallback
        above would then TRUNCATE a non-empty remote delta."""
        from pyspark.errors import AnalysisException

        try:
            self.spark.read.parquet(path).schema
            return True
        except AnalysisException:
            return False

    def read(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    # -- snapshot GC ---------------------------------------------------
    @staticmethod
    def referenced_paths(manifest: dict[str, Any]) -> set[str]:
        """Every data path the snapshot still depends on."""
        paths: set[str] = set()
        for k in ("frontier", "host_state", "bloom", "quarantine"):
            if manifest.get(k):
                paths.add(manifest[k])
        for k in ("seen", "tombstones", "fetched", "metrics"):
            paths.update(manifest.get(k) or [])
        return paths

    def data_dirs(self) -> list[str]:
        """All round-scoped data directories this store has written —
        the GC candidate set (layout-specific; adapters override)."""
        import glob as _glob

        return sorted(_glob.glob(os.path.join(self.root, "rounds", "*", "*")))

    def gc(self, manifest: dict[str, Any] | None = None) -> list[str]:
        """Delete data directories the CURRENT snapshot no longer
        references — the Iceberg ``expire_snapshots`` +
        ``remove_orphan_files`` analog for the parquet stand-in.

        Two kinds of garbage accumulate in a long crawl: deltas folded
        away by seen compaction (their rows live on in the compacted
        snapshot) and orphan dirs from rounds that crashed before
        their manifest commit.  Both are invisible to readers (readers
        only follow manifest-listed paths), so deleting them cannot
        change any result — pinned by tests/test_gc.py, which resumes
        a crawl after gc and matches the uninterrupted oracle.

        Uses the COMMITTED manifest by default (safest); only call
        with an explicit ``manifest`` that is at least as new.  Not
        concurrency-safe against a crawl actively writing the next
        round — run it between rounds, like any table maintenance job.
        Returns the deleted paths."""
        import shutil

        manifest = manifest or self.read_manifest()
        if manifest is None:
            return []
        keep = self.referenced_paths(manifest)
        deleted = []
        for d in self.data_dirs():
            if d not in keep:
                shutil.rmtree(d, ignore_errors=True)
                deleted.append(d)
        return deleted

    # -- contract ------------------------------------------------------
    # The engine depends ONLY on this surface: read_manifest / commit /
    # round_dir / write / read / read_union.  Any adapter honoring it
    # (Iceberg catalog tables, an object store, a different directory
    # scheme) drops in without touching the round loop — proven by
    # FlatStateStore + tests/test_state_contract.py.

    def read_union(
        self, paths: list[str], columns: list[str] | None = None
    ) -> DataFrame | None:
        """Union of per-path reads.  ``columns``: project each root to
        these columns before the union — roots written before/after a
        layout change (e.g. tombstones gaining a ``bucket`` partition
        column) then still union cleanly."""
        if not paths:
            return None
        if len(paths) == 1:
            df = self.spark.read.parquet(paths[0])
            return df.select(*columns) if columns else df
        # per-path reads unioned: a multi-path read over hive-
        # partitioned roots (bucket=K dirs) trips partition-discovery
        # conflict detection; per-root reads infer each layout cleanly
        dfs = [self.spark.read.parquet(p) for p in paths]
        if columns:
            dfs = [df.select(*columns) for df in dfs]
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out


class FlatStateStore(StateStore):
    """Contract-compliance twin of :class:`StateStore` with a
    DELIBERATELY different physical layout — flat sibling directories
    (``r000007--fetched``) instead of nested ``rounds/000007/fetched``,
    and a differently-named manifest file.

    It exists to prove the engine is storage-agnostic: the frontier
    round loop must produce byte-identical results through any adapter
    honoring the read/write/commit surface (the Iceberg-swap claim in
    this module's docstring, exercised by tests/test_state_contract.py
    rather than asserted)."""

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "snapshot-manifest.json")

    def round_dir(self, rnd: int, name: str) -> str:
        return os.path.join(self.root, f"r{rnd:06d}--{name}")

    def data_dirs(self) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(os.path.join(self.root, "r[0-9]*--*")))
