"""CLI entry points (SURVEY §3).

≙ the reference's WP-CLI commands (lib/CommandRegistrar.php:32-36:
``wp etl config|process|janitor|extract|transform``):

    python -m wp_etl_migration_spark process   migration.yaml [--dry-run]
                                               [--include a,b] [--skip c]
    python -m wp_etl_migration_spark analyze   migration.yaml [--manifest p]
    python -m wp_etl_migration_spark extract   migration.yaml JOB --mode json
    python -m wp_etl_migration_spark config    migration.yaml
"""

from __future__ import annotations

import argparse
import json
import sys

from wp_etl_migration_spark.plans.pipeline import write_manifest
from wp_etl_migration_spark.plans.runner import Runner
from wp_etl_migration_spark.session import get_spark
from wp_etl_migration_spark.sinks import files as fsink


def _split(s: str | None) -> list[str] | None:
    return s.split(",") if s else None


def main(argv: list[str] | None = None) -> int:
    """CLI dispatcher: process / extract / transform / config /
    janitor subcommands (≙ the reference's `wp etl` command family,
    SURVEY §3)."""
    ap = argparse.ArgumentParser(prog="wp_etl_migration_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("process", help="run the full ETL (≙ wp etl process)")
    p.add_argument("config")
    p.add_argument("--output-dir", default="output")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--include")
    p.add_argument("--skip")

    a = sub.add_parser("analyze", help="row counts per job (≙ analyze)")
    a.add_argument("config")
    a.add_argument("--output-dir", default="output")
    a.add_argument("--manifest")

    e = sub.add_parser("extract", help="extract one job to a file sink")
    e.add_argument("config")
    e.add_argument("job")
    e.add_argument("--output-dir", default="output")
    e.add_argument("--mode", choices=["json", "csv"], default="json")
    e.add_argument("--file")
    e.add_argument("--with-transform", action="store_true",
                   help="also apply the job's transform steps "
                        "(≙ wp etl transform)")

    c = sub.add_parser("config", help="validate config + preview jobs")
    c.add_argument("config")

    j = sub.add_parser("janitor",
                       help="preview/delete rows of a dataset "
                            "(≙ wp etl janitor empty-posts)")
    j.add_argument("dataset", help="parquet dataset path")
    j.add_argument("--where", required=True,
                   help="SQL predicate selecting rows to delete")
    j.add_argument("--yes", action="store_true",
                   help="actually delete (default: preview count only)")

    t = sub.add_parser(
        "takedown",
        help="tombstone ids out of a continuous-dedup store, and/or "
             "physically purge tombstoned corpus content")
    t.add_argument("store", help="IncrementalDedup store_dir")
    t.add_argument("--id-col", default="doc_id")
    t.add_argument("--text-col", default="text")
    t.add_argument("--ids", help="comma-separated ids to tombstone")
    t.add_argument("--batch-id", type=int,
                   help="monotone batch id for the tombstone "
                        "(required with --ids; must exceed the "
                        "store's folded_up_to)")
    t.add_argument("--purge", action="store_true",
                   help="physically rewrite tombstoned corpus "
                        "partitions (bytes gone) and retire the "
                        "applied tombstone records")

    s = sub.add_parser(
        "stats",
        help="operational snapshot of a continuous store (tail "
             "partitions, pointer, tombstones, rows) as one JSON line")
    s.add_argument("store", help="store_dir of the loop")
    s.add_argument("--kind", choices=["dedup", "ann"],
                   default="dedup")
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.add_argument("--vec-col", default="embedding")

    args = ap.parse_args(argv)

    if args.cmd == "stats":
        import json as _json

        from wp_etl_migration_spark.streaming.incremental import (
            IncrementalAnnIndex, IncrementalDedup)
        spark = get_spark("wp-etl-cli")
        if args.kind == "dedup":
            loop = IncrementalDedup(spark, args.store, args.id_col,
                                    args.text_col)
            print(_json.dumps(loop.stats(), sort_keys=True))
        else:
            # maintenance-only construction: stats never touches the
            # routing planes
            idx = IncrementalAnnIndex(spark, args.store, args.id_col,
                                      args.vec_col)
            print(_json.dumps(idx.stats(), sort_keys=True))
        return 0

    if args.cmd == "takedown":
        from wp_etl_migration_spark.streaming.incremental import (
            IncrementalDedup)
        if not args.ids and not args.purge:
            print("nothing to do: pass --ids and/or --purge")
            return 2
        if args.ids and args.batch_id is None:
            print("--ids requires --batch-id (the store's monotone "
                  "id space)")
            return 2
        spark = get_spark("wp-etl-cli")
        loop = IncrementalDedup(spark, args.store, args.id_col,
                                args.text_col)
        if args.ids:
            ids = [int(x) for x in args.ids.split(",") if x.strip()]
            loop.delete(ids, args.batch_id)
            print(f"tombstoned {len(ids)} id(s) at batch "
                  f"{args.batch_id}")
        if args.purge:
            res = loop.purge_corpus()
            print(f"purged: {res['rows_purged']} row(s) across "
                  f"{res['partitions_rewritten']} partition(s); "
                  f"{res['tombs_retired']} tombstone record(s) "
                  "retired")
        return 0

    if args.cmd == "janitor":
        from pyspark.sql import functions as F
        from wp_etl_migration_spark.plans import janitor
        spark = get_spark("wp-etl-cli")
        df = spark.read.parquet(args.dataset)
        pred = F.expr(args.where)
        n = janitor.preview_delete(df, pred)
        print(f"{n} rows match")
        if args.yes and n:
            janitor.rewrite_dataset(
                spark, args.dataset, janitor.delete_where(df, pred))
            print(f"deleted {n} rows")
        return 0

    spark = get_spark("wp-etl-cli")
    runner = Runner(spark, args.config,
                    output_dir=getattr(args, "output_dir", "output"))

    if args.cmd == "config":
        # Reaching here means the DAG validated (Runner.__init__).
        for job in runner.jobs:
            flags = []
            if job.skip:
                flags.append("skip")
            if job.depends_on:
                flags.append(f"depends_on={job.depends_on}")
            print(f"{job.name}" + (f"  [{', '.join(flags)}]"
                                   if flags else ""))
        return 0

    if args.cmd == "process":
        reports = runner.run(include=_split(args.include),
                             skip=_split(args.skip),
                             dry_run=args.dry_run)
        for r in reports:
            state = "validated" if args.dry_run else "loaded"
            print(f"{r.name}: {state} in {r.seconds}s")
        return 0

    if args.cmd == "analyze":
        reports = runner.analyze()
        for r in reports:
            print(f"{r.name}: {r.rows} rows in {r.seconds}s")
        if args.manifest:
            write_manifest(reports, args.manifest)
        return 0

    if args.cmd == "extract":
        job = next((j for j in runner.jobs if j.name == args.job), None)
        if job is None:
            print(f"unknown job '{args.job}'", file=sys.stderr)
            return 1
        runner.current_job = job.name
        df = runner.extract(job)
        if args.with_transform:
            df = runner.transform(df, job)
        dest = args.file or fsink.destination(
            runner.output_dir, job.name, args.mode)
        if args.mode == "json":
            fsink.write_json(df, dest)
        else:
            fsink.write_csv(df, dest)
        n = spark.read.format(args.mode).load(dest).count()
        print(json.dumps({"job": job.name, "rows": n, "dest": dest}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
