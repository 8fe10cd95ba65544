"""Production feature-assembly job.

Submission shape (north rule: "submitted via spark-submit --py-files"):

    cd /root/repo && zip -r /tmp/engine.zip recipeselectors_spark
    spark-submit --py-files /tmp/engine.zip jobs/assemble_features_job.py \
        --input  <iceberg-table-or-parquet-path> \
        --output <dir> \
        --shards 256 \
        [--session-gap 1800] [--resume]

The job is resumable: per-shard parquet + manifest checkpoints
(sources/checkpoint.py) mean a restart skips completed shards. Lineage and
row-count metrics are appended to <output>/lineage.jsonl per shard.

On a cluster, ``--master`` etc. come from spark-submit; locally the session
factory falls back to local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# plain-python invocation from anywhere: make the repo importable
# (under spark-submit --py-files the zip on PYTHONPATH already provides it)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="Iceberg table name or parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--shards", type=int, default=64)
    p.add_argument("--session-gap", type=int, default=1800)
    p.add_argument("--rolling-n", type=int, default=5)
    p.add_argument("--sample-frac", type=float, default=None,
                   help="sample fraction for the shard-map count pass (use at 10^12 scale)")
    p.add_argument("--max-concurrent", type=int, default=4,
                   help="concurrent shard jobs (driver thread pool)")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing manifests and recompute everything")
    args = p.parse_args(argv)

    from recipeselectors_spark.operators import assembly
    from recipeselectors_spark.session import get_spark
    from recipeselectors_spark.sources import checkpoint as ckpt
    from recipeselectors_spark.sources import transcripts as T

    spark = get_spark(app_name="assemble_features")
    t0 = time.time()
    tx = T.read_transcripts(spark, args.input)

    if args.no_resume:
        import shutil
        shutil.rmtree(os.path.join(args.output, "_manifests"), ignore_errors=True)

    manifests = ckpt.run_sharded(
        tx,
        args.output,
        lambda df: assembly.assemble_features(
            df, session_gap_s=args.session_gap, rolling_n=args.rolling_n
        ),
        num_shards=args.shards,
        source_desc=args.input,
        sample_frac=args.sample_frac,
        max_concurrent=args.max_concurrent,
    )
    total_rows = sum(m["n_rows"] for m in manifests)
    wall = round(time.time() - t0, 2)
    ckpt.lineage_log(args.output, {
        "event": "job_complete",
        "input": args.input,
        "shards": len(manifests),
        "rows": total_rows,
        "wall_seconds": wall,
        "turns_per_sec": round(total_rows / wall, 1) if wall else None,
    })
    print(json.dumps({"rows": total_rows, "shards": len(manifests), "sec": wall}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
