"""Command-line entry points — the engine's analog of the reference CLIs
(``latyas/tools/pdf2text.py:49-62`` argparse flow).

Subcommands::

    python -m latyas_ray.cli gen-corpus --out DIR --rows N [--shards K]
    python -m latyas_ray.cli extract    --in CORPUS --out DIR
                                        [--partitions N] [--batch-size B]
                                        [--no-actors] [--metrics]
    python -m latyas_ray.cli metrics    --out DIR
    python -m latyas_ray.cli export     --sf-dir DIR --out DIR [--shards N]
    python -m latyas_ray.cli ops        --list | --query NAME
                                        [--sf-dir DIR] [--limit N]

The CLI owns its Ray session (guarded init / shutdown); library code
never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    """Returns (ray, owns_session): shutdown only a session WE created —
    when embedded in a host that already initialized Ray (tests, driver),
    tearing its session down would be hostile."""
    import ray

    owns = not ray.is_initialized()
    if owns:
        kwargs = dict(
            address="local", include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    if owns:
        # only tune a session WE created: flipping the global DataContext
        # or logger levels under a host that configured its own would be
        # as hostile as shutting its session down
        import logging

        from ray.data import DataContext

        # all-map plan: per-operator CPU reservation only caps the
        # dominant stage's width (see bench.py); backpressure alone
        # regulates it
        ctx = DataContext.get_current()
        ctx.op_resource_reservation_enabled = False
        ctx.enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray, owns


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="latyas_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-corpus", help="generate the synthetic corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--shards", type=int, default=None)

    e = sub.add_parser("extract", help="run the resumable extraction job")
    e.add_argument("--in", dest="corpus", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--partitions", type=int, default=8)
    e.add_argument("--batch-size", type=int, default=32)
    e.add_argument("--no-actors", action="store_true")
    e.add_argument("--preset", default=None,
                   choices=["paper", "report", "book"],
                   help="named pipeline preset (pipelines/presets.py)")
    e.add_argument("--config", default=None,
                   help="pipeline spec file or directory containing "
                        "config.json (pipelines/config.py — the "
                        "from_pretrained analog); mutually exclusive "
                        "with --preset")
    e.add_argument("--metrics", action="store_true",
                   help="run the per-lang rollup after the job completes")

    m = sub.add_parser("metrics", help="(re)compute the per-lang rollup")
    m.add_argument("--out", required=True)

    x = sub.add_parser("export", help="write hash-assigned training shards")
    x.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    x.add_argument("--out", required=True)
    x.add_argument("--shards", type=int, default=64)

    o = sub.add_parser("ops", help="run one driver query over an sf dir")
    o.add_argument("--list", action="store_true", help="list query names")
    o.add_argument("--query", default=None)
    o.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    o.add_argument("--limit", type=int, default=20,
                   help="rows of output to print (full row count always shown)")

    args = p.parse_args(argv)

    if args.cmd == "ops" and (args.list or not args.query):
        # listing touches no data — don't boot a cluster for it
        print(json.dumps(sorted(_query_registry())))
        return 0
    if args.cmd == "ops" and args.query not in _query_registry():
        print(f"unknown query {args.query!r}; valid names:", file=sys.stderr)
        print(json.dumps(sorted(_query_registry())), file=sys.stderr)
        return 2

    ray, owns_session = _ray_session(args.num_cpus)
    try:
        if args.cmd == "gen-corpus":
            from .corpus import generate_corpus

            out = generate_corpus(args.out, args.rows, n_shards=args.shards)
            print(json.dumps({"corpus": out, "rows": args.rows}))
        elif args.cmd == "extract":
            from .pipelines.extract_pipeline import rollup_metrics, run_resumable

            preset = args.preset
            if args.config is not None:
                if preset is not None:
                    raise SystemExit("--config and --preset are exclusive")
                from .pipelines.config import load_pipeline_config

                preset = load_pipeline_config(args.config)
            res = run_resumable(
                args.corpus, args.out,
                n_partitions=args.partitions,
                batch_size=args.batch_size,
                use_actors=not args.no_actors,
                preset=preset,
            )
            if args.metrics and res["complete"]:
                rollup_metrics(args.out)
            print(json.dumps(res))
        elif args.cmd == "metrics":
            from .pipelines.extract_pipeline import rollup_metrics

            df = rollup_metrics(args.out)
            print(df.to_json(orient="records"))
        elif args.cmd == "export":
            from .ops.export import shard_export_write

            manifest = shard_export_write(args.sf_dir, args.out,
                                          n_shards=args.shards)
            print(json.dumps({
                "out": args.out,
                "n_shards": int(len(manifest)),
                "n_docs": int(manifest["n_docs"].sum()),
                "sum_chars": int(manifest["sum_chars"].sum()),
            }))
        elif args.cmd == "ops":
            import ray.data as rd

            res = _query_registry()[args.query](args.sf_dir)
            if isinstance(res, rd.Dataset):
                # never materialize the full Dataset on the driver for a
                # head sample — count streams, limit() bounds the pull
                n = res.count()
                df = res.limit(args.limit).to_pandas()
            else:
                df = res.to_pandas() if hasattr(res, "to_pandas") else res
                n = len(df)
                df = df.head(args.limit)
            print(json.dumps({
                "query": args.query,
                "rows": int(n),
                "head": json.loads(df.to_json(orient="records")),
            }))
    finally:
        if owns_session:
            ray.shutdown()
    return 0


def _query_registry():
    """The driver contract's ``queries()`` registry (repo-root module);
    imported lazily so library use never needs it on the path."""
    try:
        import __ray_entry__
    except ImportError as e:
        raise SystemExit(
            "the 'ops' subcommand needs the repo root on PYTHONPATH "
            f"(__ray_entry__ not importable: {e})"
        )
    return __ray_entry__.queries()


if __name__ == "__main__":
    sys.exit(main())
