"""``ray job submit`` entrypoint for the extraction pipeline.

The north rule launches this on a fixed-size multi-node cluster:

    ray job submit --working-dir . -- \
        python jobs/extract_job.py --in /data/corpus --out /data/extracted \
        --partitions 512

On a cluster the driver connects to the running Ray (``ray.init()`` with
no address resolves ``RAY_ADDRESS`` from the job env); in this sandbox it
starts a local session.  The job is resumable: rerunning after preemption
skips partitions whose lineage records are complete and version-matched
(``latyas_ray.state.lineage``), so a preempted ``ray job submit`` is
safely re-submitted with the same arguments.

Exit code 0 only when every partition is complete; the per-lang metric
rollup (the job's only groupby, off the hot path) is written to
``<out>/metrics.json`` alongside the per-partition lineage records.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Launched as `python jobs/extract_job.py`, sys.path[0] is jobs/ — put the
# repo root (the job's working dir) first so `latyas_ray` imports.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in", dest="corpus", required=True, help="corpus dir of pages-*.parquet")
    p.add_argument("--out", required=True, help="output dir (partitioned parquet + lineage)")
    p.add_argument("--partitions", type=int, default=64,
                   help="deterministic partition count (resume granularity)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--pdf-pool", type=int, default=4,
                   help="actor-pool size for the PDF layout-model stage")
    p.add_argument("--no-actors", action="store_true",
                   help="run everything as stateless tasks (no model stage)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # On a cluster this attaches to the job's Ray (`ray job submit
        # --working-dir .` ships the repo to every worker); standalone it
        # starts a local one, whose raylet/workers inherit this process's
        # env — export PYTHONPATH so workers can import latyas_ray even
        # when the job was launched from outside the repo.
        os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get(
            "PYTHONPATH", "")
        ray.init(ignore_reinit_error=True, include_dashboard=False)

    from ray.data import DataContext

    # all-map plan: per-operator CPU reservation only caps the dominant
    # stage's width (see bench.py); backpressure alone regulates it
    DataContext.get_current().op_resource_reservation_enabled = False

    from latyas_ray.pipelines.extract_pipeline import rollup_metrics, run_resumable

    result = run_resumable(
        args.corpus,
        args.out,
        n_partitions=args.partitions,
        batch_size=args.batch_size,
        concurrency=args.pdf_pool,
        use_actors=not args.no_actors,
    )
    print(json.dumps({"job": "extract", **{k: result[k] for k in
                                           ("n_partitions", "complete")},
                      "n_processed": len(result["processed"]),
                      "n_skipped": len(result["skipped"])}))
    if result["complete"]:
        rollup_metrics(args.out)
    ray.shutdown()
    return 0 if result["complete"] else 1


if __name__ == "__main__":
    sys.exit(main())
