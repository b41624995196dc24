"""Production job entry point — the spark-submit target.

Cluster usage (artifact shipping per SURVEY §2.1 "weights download" row —
ship at submit time, never download at task time):

  spark-submit \
    --py-files quality_filter.zip \
    --files artifacts/langid.npz,artifacts/lm.npz,artifacts/rules.json \
    scripts/run_job.py \
    --input iceberg:warehouse.pages --output s3://.../pages_scored \
    --manifest s3://.../manifests/run1.jsonl --resume

Local smoke:
  python scripts/run_job.py --input /tmp/pages --output /tmp/scored \
    --manifest /tmp/m.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages source (path or iceberg:<table>)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", required=True, help="checkpoint manifest (JSONL)")
    ap.add_argument("--artifact-dir", default=None)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore the manifest and reprocess every split")
    ap.add_argument("--compact", action="store_true",
                    help="after processing, compact small files per day-partition")
    args = ap.parse_args()

    from quality_filter.config import DEFAULT_ARTIFACT_DIR
    from quality_filter.io.checkpoint import run_with_resume
    from quality_filter.session import get_spark

    artifact_dir = args.artifact_dir or DEFAULT_ARTIFACT_DIR
    if args.no_resume and os.path.exists(args.manifest):
        os.remove(args.manifest)

    spark = get_spark(cpus=args.cpus, app_name="qf-run")
    t0 = time.perf_counter()
    summary = run_with_resume(
        spark, args.input, args.output, args.manifest, artifact_dir=artifact_dir
    )
    if args.compact and not args.output.startswith(("s3:", "gs:", "abfs", "hdfs:")):
        from quality_filter.io.maintenance import compact_partitions

        summary["compaction"] = compact_partitions(spark, args.output)
    summary["wall_sec"] = round(time.perf_counter() - t0, 3)
    spark.stop()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
