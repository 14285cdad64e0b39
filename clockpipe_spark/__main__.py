"""CLI entrypoint, mirroring the reference's ``clockpipe run
--config-file`` (command.rs:10-13, 50-56):

    python -m clockpipe_spark run --config-file cfg.json \
        --source-dir /root/testdata/sf0.01 --target-root /tmp/replica

Dispatches on the config's source_type like main.rs:38-49 (one source
kind in this harness: parquet_cdc).
"""

from __future__ import annotations

import argparse
import json
import sys

from clockpipe_spark.config import PipeConfig
from clockpipe_spark.session import get_spark
from clockpipe_spark.sync_job import SyncJob


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="clockpipe_spark")
    sub = parser.add_subparsers(dest="command", required=True)
    run = sub.add_parser("run", help="run a sync pipe from a JSON config")
    run.add_argument("--config-file", required=True)
    run.add_argument("--source-dir", required=True)
    run.add_argument("--target-root", required=True)
    run.add_argument("--max-iterations", type=int, default=None)
    args = parser.parse_args(argv)

    try:
        with open(args.config_file) as f:
            config = PipeConfig.from_json(f.read())
    except (OSError, ValueError, KeyError) as e:
        print(f"error: cannot read config {args.config_file}: {e}", file=sys.stderr)
        return 2
    if config.source_type not in ("parquet_cdc",):
        print(f"unsupported source_type: {config.source_type}", file=sys.stderr)
        return 2

    spark = get_spark("clockpipe-run")
    job = SyncJob(spark, config, args.source_dir, args.target_root)
    result = job.run(args.max_iterations)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
