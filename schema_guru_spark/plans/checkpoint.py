"""Per-partition checkpointed lineage + metrics (north_rule P4).

A validation run over B buckets writes, per completed CHUNK of buckets,
a manifest append recording each finished bucket with its metrics. A
killed job, on restart, reads the manifest and skips every finished
bucket — resume without recomputing completed partitions.

The manifest is plain parquet (append-only, tiny), readable by any
engine; no reference counterpart (the reference has no checkpointing).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Optional, Set

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = ("bucket int, status string, n_rows bigint, "
                   "n_ok bigint, n_err bigint, metrics string, "
                   "run_id string, finished_at double")


class CheckpointManager:
    def __init__(self, spark: SparkSession, checkpoint_dir: str,
                 run_id: Optional[str] = None):
        self.spark = spark
        self.dir = checkpoint_dir
        self.manifest_path = os.path.join(checkpoint_dir, "manifest")
        self.run_id = run_id or f"run-{int(time.time() * 1000)}"

    def _manifest_exists(self) -> bool:
        # works for local paths; for object stores the read itself is the probe
        try:
            self.spark.read.parquet(self.manifest_path).limit(1).collect()
            return True
        except Exception:
            return False

    def finished_buckets(self) -> Set[int]:
        if not self._manifest_exists():
            return set()
        rows = (self.spark.read.parquet(self.manifest_path)
                .where(F.col("status") == "done")
                .select("bucket").distinct().collect())
        return {r["bucket"] for r in rows}

    def record_done(self, bucket_metrics: Iterable[dict]) -> None:
        """Append one manifest row per finished bucket.
        Each dict: {bucket, n_rows, n_ok, n_err, **extra}."""
        now = time.time()
        rows = [
            (int(m["bucket"]), "done", int(m.get("n_rows", 0)),
             int(m.get("n_ok", 0)), int(m.get("n_err", 0)),
             json.dumps({k: v for k, v in m.items()
                         if k not in ("bucket", "n_rows", "n_ok", "n_err")},
                        sort_keys=True, default=str),
             self.run_id, now)
            for m in bucket_metrics
        ]
        if not rows:
            return
        (self.spark.createDataFrame(rows, MANIFEST_SCHEMA)
         .coalesce(1)
         .write.mode("append").parquet(self.manifest_path))

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(self.manifest_path)
