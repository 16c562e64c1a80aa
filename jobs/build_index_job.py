"""`ray job submit` entrypoint for the index build on a real cluster.

The north rule runs the build "via ray job submit on a fixed-size
multi-node Ray cluster at N and 4N nodes".  This sandbox has no cluster,
but the submission shape is plain and this file IS the entrypoint:

    ray job submit --address http://<head>:8265 \\
        --working-dir . \\
        -- python jobs/build_index_job.py \\
           --pages s3://bucket/pages/ --index s3://bucket/idx \\
           --shards 256 --salts 64

Inside a submitted job `ray.init()` with NO address connects to the
hosting cluster (Ray injects RAY_ADDRESS); locally the same script runs
against a local session, so the entrypoint is testable here.  Everything
scale-relevant lives in the library, not this wrapper: shard-granular
checkpoints make a resubmitted job resume (`state/checkpoint.py`), shard
count scales with nodes, and the manifest records per-shard lineage +
build metrics for the run ledger.  The two-cluster-size scaling evidence
for THIS sandbox is `bench.py --scaling` (same job, num_cpus=8 vs 32 in
fresh sessions — BASELINE.md).

Exit code 0 and one JSON line on stdout (the manifest summary) on
success — `ray job logs` / CI can parse the last line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# `python jobs/build_index_job.py` puts jobs/ on sys.path, not the repo
# root; under `ray job submit --working-dir .` the working dir is the
# root.  Make both work:
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--salts", type=int, default=16)
    p.add_argument("--positions", action="store_true")
    p.add_argument("--extend", action="store_true",
                   help="append to an existing index instead of building")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():  # under `ray job submit` this attaches
        ray.init()                # to the hosting cluster via RAY_ADDRESS

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (  # noqa: E501
        build,
    )
    if args.extend:
        m = build.extend_index(args.pages, args.index,
                               num_new_shards=args.shards)
    else:
        m = build.build_index(
            args.pages, args.index,
            build.BuildParams(num_shards=args.shards, num_salts=args.salts,
                              positions=args.positions))
    print(json.dumps({k: m[k] for k in
                      ("n_docs", "avg_dl", "n_shards", "n_postings",
                       "build_secs", "docs_per_sec")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
