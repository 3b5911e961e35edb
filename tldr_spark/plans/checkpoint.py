"""Iteration checkpointing with per-partition lineage + metrics, resumable.

Iceberg-style layout (no Iceberg runtime jar in this sandbox — the layout is
data files + JSON metadata we manage, isolated here so a real Iceberg catalog
is a config swap; see SURVEY.md §7):

    <root>/
      metadata.json              # {"snapshots": [{iteration, path, metrics,
                                 #   partitions: [{pid, rows}], committed}]}
      iter=<k>/part-*.parquet    # rank/label snapshot for iteration k

Commit protocol: write data files, then rewrite metadata.json via
tmp-file + atomic rename — a snapshot is visible only after the rename, so
a killed run resumes from the last COMMITTED iteration (test_checkpoint.py
kills mid-iteration and verifies identical fixpoints).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class IterativeCheckpoint:
    def __init__(self, spark: SparkSession, root: str, collect_lineage: bool = True):
        self.spark = spark
        self.root = root
        self.collect_lineage = collect_lineage
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "metadata.json")

    # -- metadata ----------------------------------------------------------
    def _read_meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"snapshots": []}
        with open(self._meta_path, encoding="utf-8") as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)  # atomic commit

    # -- API ---------------------------------------------------------------
    def latest(self) -> tuple[int, DataFrame, dict] | None:
        """(iteration, snapshot df, metrics) of the newest committed snapshot."""
        snaps = [s for s in self._read_meta()["snapshots"] if s.get("committed")]
        if not snaps:
            return None
        s = max(snaps, key=lambda x: x["iteration"])
        return s["iteration"], self.spark.read.parquet(s["path"]), s["metrics"]

    def save(self, iteration: int, df: DataFrame, metrics: dict) -> DataFrame:
        """Persist snapshot + metrics; returns the re-read (lineage-free) df."""
        path = os.path.join(self.root, f"iter={iteration}")
        df.write.mode("overwrite").parquet(path)
        partitions = []
        if self.collect_lineage:
            from pyspark.sql import functions as F

            reread = self.spark.read.parquet(path)
            partitions = [
                {"pid": r["pid"], "rows": r["rows"]}
                for r in reread.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .withColumnRenamed("count", "rows")
                .collect()
            ]
        meta = self._read_meta()
        meta["snapshots"] = [s for s in meta["snapshots"] if s["iteration"] != iteration]
        meta["snapshots"].append(
            {
                "iteration": iteration,
                "path": path,
                "metrics": metrics,
                "partitions": partitions,
                "committed": True,
            }
        )
        self._write_meta(meta)
        return self.spark.read.parquet(path)

    def metrics_history(self) -> list[dict]:
        return [
            {"iteration": s["iteration"], **s["metrics"]}
            for s in sorted(self._read_meta()["snapshots"], key=lambda x: x["iteration"])
            if s.get("committed")
        ]
