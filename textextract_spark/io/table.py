"""Manifest-backed parquet table: snapshot commits + checkpoint semantics.

Iceberg stand-in (SURVEY.md §7 hard part (e)): the Iceberg runtime jar is
not available in this sandbox, so a parquet directory + JSON manifest
emulates the two Iceberg behaviors the pipeline depends on:

  * snapshot-based append commits — each ``append`` writes files to a new
    snapshot directory, then atomically (write-tmp + rename) extends the
    manifest; readers only see manifest-listed files, so a killed job never
    exposes partial output;
  * checkpoint/resume — each snapshot records the ``part_key`` set it
    covers; ``committed_part_keys()`` drives the rerun filter
    (``WHERE part_key NOT IN committed`` — SURVEY.md §4).

On a real cluster this module is replaced by
``df.writeTo("db.extracted").append()`` + an Iceberg checkpoints table;
the pipeline only touches the 4 methods below, so the swap is local.

Reference analog of the persisted watermark: last-update-check time written
to the config file (/root/reference/src/updater.py:44-65).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ManifestTable:
    def __init__(self, path: str) -> None:
        self.path = path
        self.manifest_path = os.path.join(path, "_manifest.json")
        os.makedirs(path, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _load(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"snapshots": []}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _store(self, manifest: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path)  # atomic commit point

    # -- writes ------------------------------------------------------------
    def append(self, df: DataFrame, part_keys: list[int] | None = None,
               run_id: str | None = None) -> str:
        """Write df as a new snapshot; returns the snapshot id.

        The parquet write lands in an uncommitted directory first; the
        manifest rename is the commit point (crash before it = invisible).
        """
        snapshot_id = uuid.uuid4().hex[:16]
        snap_dir = os.path.join(self.path, f"snap-{snapshot_id}")
        df.write.mode("overwrite").parquet(snap_dir)
        manifest = self._load()
        manifest["snapshots"].append({
            "snapshot_id": snapshot_id,
            "dir": f"snap-{snapshot_id}",
            "part_keys": sorted(part_keys or []),
            "run_id": run_id,
        })
        self._store(manifest)
        return snapshot_id

    def overwrite(self, df: DataFrame) -> str:
        """Replace table contents with df as a single new snapshot.

        Emulates an Iceberg REPLACE/MERGE commit: the new snapshot is
        written first, then the manifest swap makes it the only visible
        state (old snapshot dirs remain for time travel, unreferenced).
        """
        snapshot_id = uuid.uuid4().hex[:16]
        snap_dir = os.path.join(self.path, f"snap-{snapshot_id}")
        df.write.mode("overwrite").parquet(snap_dir)
        manifest = self._load()
        manifest["snapshots"] = [{
            "snapshot_id": snapshot_id,
            "dir": f"snap-{snapshot_id}",
            "part_keys": [],
            "run_id": None,
        }]
        self._store(manifest)
        return snapshot_id

    # -- reads -------------------------------------------------------------
    def snapshot_dirs(self) -> list[str]:
        return [os.path.join(self.path, s["dir"])
                for s in self._load()["snapshots"]]

    def read(self, spark: SparkSession) -> DataFrame | None:
        dirs = self.snapshot_dirs()
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def committed_part_keys(self) -> set[int]:
        keys: set[int] = set()
        for s in self._load()["snapshots"]:
            keys.update(s["part_keys"])
        return keys

    def current_snapshot_id(self) -> str | None:
        snaps = self._load()["snapshots"]
        return snaps[-1]["snapshot_id"] if snaps else None
