"""Table maintenance: small-file compaction for partitioned sinks.

The 100-TB operational problem the scoring pipeline creates over time:
every incremental run appends a few files per day-partition, and after
months a partition holds thousands of small parquet files — scan
planning, shuffle fetch, and the NameNode/object-store listing all
degrade.  (Iceberg's rewrite_data_files does this natively; this is the
hive-layout fallback matching io/pages.py's partitioned-parquet mode.)

Safety model: rewrite into a sibling temp dir, verify row count, then
atomically swap via two renames.  A crash before the first rename
leaves the partition untouched; between renames the partition is
momentarily absent (the same window a hive INSERT OVERWRITE has) —
callers needing stronger guarantees use the Iceberg path.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def _recover_crashed_swap(path: str, scratch: str) -> dict[str, str]:
    """Restore partitions lost to a crash between compaction's two renames.

    After ``os.rename(src, old)`` but before ``os.rename(tmp, src)`` the
    live partition dir is absent and the ONLY copies of its data are the
    scratch entries ``old_<part>`` (the original) and ``tmp_<part>`` (the
    row-count-verified rewrite).  Blindly clearing scratch at the start of
    the next run would permanently destroy that partition.  So: for every
    scratch entry whose live partition is missing, rename one complete
    copy back — prefer ``tmp_`` (completes the interrupted compaction),
    fall back to ``old_``.  Entries whose live partition exists are mere
    stale copies and are left for the caller's rmtree.

    Returns {partition: restored_scratch_entry}."""
    recovered: dict[str, str] = {}
    if not os.path.isdir(scratch):
        return recovered
    for entry in sorted(os.listdir(scratch)):
        if not entry.startswith(("old_", "tmp_")):
            continue
        part = entry[4:]
        if part in recovered:
            continue
        live = os.path.join(path, part)
        if os.path.isdir(live):
            continue  # live partition intact: entry is a stale copy
        tmp = os.path.join(scratch, "tmp_" + part)
        old = os.path.join(scratch, "old_" + part)
        src = tmp if os.path.isdir(tmp) else old
        os.rename(src, live)
        recovered[part] = os.path.basename(src)
    return recovered


def partition_file_stats(path: str) -> dict[str, dict]:
    """{partition_dir: {n_files, bytes}} for a hive-partitioned sink."""
    out = {}
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        # leading '_'/'.' entries are invisible to Spark/Hadoop listing
        # (and to us): compaction scratch dirs live in that namespace
        if not os.path.isdir(full) or "=" not in entry or entry.startswith(("_", ".")):
            continue
        files = [
            f for f in os.listdir(full)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        out[entry] = {
            "n_files": len(files),
            "bytes": sum(os.path.getsize(os.path.join(full, f)) for f in files),
        }
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    min_files: int = 4,
) -> dict:
    """Rewrite every partition holding more than ``min_files`` files
    into ceil(bytes / target) files.  Returns a summary of what was
    rewritten.  Row-count-verified before the swap; idempotent (a
    compacted partition is below min_files and is skipped next run).

    Scratch lives under `<root>/_compact/` — a '_'-prefixed, '='-free
    directory name, which Spark/Hadoop listing prunes entirely (note:
    a leading '_' alone is NOT enough — names containing '=' are
    exempt from the underscore filter to allow partition values that
    start with '_', so `_compact_tmp_<part>` would still be discovered
    as a conflicting partition).  A reader of the table root
    mid-compaction (or after a crash between the two renames) never
    sees the scratch copy as a partition, and partition_file_stats
    never mistakes a stale leftover for data.  Leftovers from a crashed
    previous run are handled up front: if the crash hit the window between
    the two renames (live partition gone, only scratch copies remain) the
    partition is restored from scratch first; only then is scratch — by
    now holding nothing but redundant stale copies — cleared."""
    scratch = os.path.join(path, "_compact")
    # restore any partition whose ONLY copies live in crashed-run scratch,
    # then clear the (now purely redundant) scratch before measuring
    recovered = _recover_crashed_swap(path, scratch)
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    stats = partition_file_stats(path)
    done = {}
    for part, st in stats.items():
        if st["n_files"] <= min_files:
            continue
        src = os.path.join(path, part)
        n_out = max(1, -(-st["bytes"] // target_file_bytes))
        df = spark.read.parquet(src)
        n_rows = df.count()
        tmp = os.path.join(scratch, "tmp_" + part)
        old = os.path.join(scratch, "old_" + part)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
        if spark.read.parquet(tmp).count() != n_rows:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(f"compaction row-count mismatch in {part}")
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)
        done[part] = {
            "files_before": st["n_files"],
            "files_after": len(
                [f for f in os.listdir(src) if f.endswith(".parquet")]
            ),
            "rows": n_rows,
        }
    shutil.rmtree(scratch, ignore_errors=True)
    return {"compacted": done, "skipped": len(stats) - len(done), "recovered": recovered}
