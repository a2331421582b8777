"""Checkpointed, idempotent, resumable writes with per-bucket lineage.

No Iceberg runtime ships in this environment, so this module emulates
the same contract with atomic parquet staging + a commit log
(flagged emulation; swap ``CheckpointedWriter`` for an Iceberg
``MERGE``-based implementation on a real cluster — the interface and
the resume semantics are identical):

- documents carry a deterministic ``bucket`` = xxhash64(url) % N
- buckets are processed in ``groups`` commit units; each unit writes to
  a staging dir, atomically renames it into the output, then appends a
  manifest line ``{group, buckets, n_rows, batch_id}`` to commit_log.jsonl
- a killed job re-runs only groups missing from the commit log
  (anti-join on committed buckets); re-running a committed group is a
  no-op (idempotent)
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, functions as F


class CheckpointedWriter:
    def __init__(self, out_dir: str, n_shards: int, groups: int = 16):
        self.out_dir = out_dir
        self.n_shards = n_shards
        self.groups = groups
        self.log_path = os.path.join(out_dir, "commit_log.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    # -- commit log ------------------------------------------------------
    def committed_groups(self) -> set:
        done = set()
        if os.path.exists(self.log_path):
            with open(self.log_path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        done.add(json.loads(line)["group"])
        return done

    def committed_buckets(self) -> set:
        done = set()
        if os.path.exists(self.log_path):
            with open(self.log_path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        done.update(json.loads(line)["buckets"])
        return done

    def _append_log(self, entry: dict):
        # single-writer append; atomic enough at driver granularity
        with open(self.log_path, "a") as f:
            f.write(json.dumps(entry, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # -- write -----------------------------------------------------------
    def run(self, extracted: DataFrame, batch_id: str | None = None) -> dict:
        """Write ``extracted`` (must have a ``bucket`` column) in
        ``groups`` independent commit units; resume-safe."""
        batch_id = batch_id or uuid.uuid4().hex
        done = self.committed_groups()
        stats = {"groups_total": self.groups, "groups_skipped": len(done)}
        df = extracted.withColumn(
            "commit_group",
            F.pmod(F.col("bucket"), F.lit(self.groups)).cast("int"),
        )
        # one pass per commit unit keeps commit units independent; at
        # cluster scale, one unit == one spark job over ~1/groups of data
        for g in range(self.groups):
            if g in done:
                continue
            part = df.filter(F.col("commit_group") == g).drop("commit_group")
            staging = os.path.join(self.out_dir, f"_staging_{g}_{batch_id}")
            final = os.path.join(self.out_dir, f"group={g}")
            n_rows = part.count()
            part.write.mode("overwrite").parquet(staging)
            if os.path.exists(final):
                shutil.rmtree(final)  # stale partial from a killed run
            os.replace(staging, final)
            buckets = list(range(g, self.n_shards, self.groups))
            self._append_log(
                {
                    "group": g,
                    "buckets": buckets,
                    "n_rows": n_rows,
                    "batch_id": batch_id,
                }
            )
        stats["groups_written"] = self.groups - len(done)
        return stats

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "group=*"))

    def filter_uncommitted(self, pages: DataFrame, url_col: str = "url") -> DataFrame:
        """Resume helper: drop input rows whose bucket already committed
        (left_anti join on the committed bucket set, broadcast)."""
        committed = sorted(self.committed_buckets())
        if not committed:
            return pages
        spark = pages.sparkSession
        committed_df = spark.createDataFrame(
            [(b,) for b in committed], "bucket int"
        )
        with_bucket = pages.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col(url_col)), F.lit(self.n_shards)).cast("int"),
        )
        return with_bucket.join(
            F.broadcast(committed_df), on="bucket", how="left_anti"
        ).drop("bucket")
