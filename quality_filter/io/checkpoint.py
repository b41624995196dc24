"""Partition-level checkpoint manifest + resume.

north_star: "resumes from a partition-level checkpoint manifest so a
killed run replays only incomplete splits."  A split = one warc_dt day
partition.  The manifest is a JSON-lines file, one record per completed
split, written atomically (tmp + rename) AFTER the split's output commit;
a split's output write is idempotent (per-partition overwrite), so a
crash between write and manifest append just replays that one split.

Each manifest record doubles as the per-partition lineage/metrics row
(the processing_time_ms + version envelope analog,
/root/reference/app/pydantic_models.py:90-106).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from quality_filter import __version__
from quality_filter.config import DEFAULT_ARTIFACT_DIR, RuleConfig
from quality_filter.io.pages import PARTITION_COL, read_pages, with_partition_col
from quality_filter.pipeline import tiered_scored


class Manifest:
    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]

    def completed_splits(self) -> set[str]:
        return {r["split"] for r in self.records()}

    def mark_done(self, record: dict) -> None:
        """Atomic append: rewrite to tmp, rename over."""
        recs = self.records()
        recs.append(record)
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for r in recs:
                f.write(json.dumps(r, sort_keys=True) + "\n")
        os.replace(tmp, self.path)


def list_splits(spark: SparkSession, input_path: str) -> list[str]:
    """Distinct day partitions of the input.  On the hive/Iceberg layout
    this is metadata-only (partition pruning / listing), not a data scan."""
    df = read_pages(spark, input_path)
    if PARTITION_COL in df.columns:
        col = F.col(PARTITION_COL).cast("string")
    else:
        col = F.to_date("warc_ts").cast("string")
    return sorted(
        r[0] for r in df.select(col.alias("s")).distinct().collect() if r[0] is not None
    )


def run_with_resume(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    manifest_path: str,
    cfg: RuleConfig | None = None,
    artifact_dir: str = DEFAULT_ARTIFACT_DIR,
) -> dict:
    """Process every pending day split; skip completed ones.  Returns a
    run summary.  Output layout: ``{output}/warc_dt=<day>/`` parquet with
    the scored schema (status column included → downstream partition
    filters)."""
    manifest = Manifest(manifest_path)
    done = manifest.completed_splits()
    splits = list_splits(spark, input_path)
    pending = [s for s in splits if s not in done]

    pages = read_pages(spark, input_path)
    if PARTITION_COL not in pages.columns:
        pages = with_partition_col(pages)

    processed = []
    statuses = ("keep", "drop", "quarantine")
    for split in pending:
        t0 = time.perf_counter()
        part = pages.filter(F.col(PARTITION_COL) == split).drop(PARTITION_COL)
        scored = tiered_scored(part, cfg, artifact_dir)
        split_dir = os.path.join(output_path, f"{PARTITION_COL}={split}")

        # lineage via observe(): metrics are collected ON the rows the
        # write consumes — same numbers as re-reading the committed
        # output, without a second full read of the sink (at 100 TB the
        # old read-back doubled sink-side I/O per split)
        obs = Observation(f"qf_{split}")
        observed = scored.observe(
            obs,
            *[
                F.sum(F.when(F.col("status") == s, 1).otherwise(0)).alias(s)
                for s in statuses
            ],
        )
        observed.write.mode("overwrite").parquet(split_dir)
        metrics = obs.get  # blocks until the write action finishes
        by_status = {s: int(metrics[s] or 0) for s in statuses if metrics[s]}
        record = {
            "split": split,
            "rows_out": int(sum(by_status.values())),
            "by_status": by_status,
            "wall_sec": round(time.perf_counter() - t0, 3),
            "engine_version": __version__,
            "input": input_path,
        }
        manifest.mark_done(record)
        processed.append(split)

    return {
        "splits_total": len(splits),
        "splits_skipped": len(splits) - len(pending),
        "splits_processed": processed,
    }


def partition_lineage(scored: DataFrame) -> DataFrame:
    """Per-Spark-partition metric rows (TaskContext-level lineage):
    partition id → rows per status.  Declarative, exact."""
    return (
        scored.groupBy(
            F.spark_partition_id().alias("partition_id"), "status"
        ).agg(F.count(F.lit(1)).alias("n_rows"))
    )
