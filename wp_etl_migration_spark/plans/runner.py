"""Job runner: config → composed DataFrame → sinks (SURVEY §3).

≙ PipelineJob.php:100-134 (Extract → Transform → Load orchestrators over
one lazy state) and Load Orchestrator.php:94-113 (uid column, loader
fan-out). The whole job stays ONE lazy Spark plan from scan to sink —
Catalyst sees through every step (the reference materializes between
RSS pages; we never do).

Extension points (≙ SURVEY §2.10): ``register_transform`` /
``register_loader`` add named steps a YAML job can reference — the Spark
translation of the reference's ``pipeline: <FQCN>`` / ``loader: custom``
plugin classes (Transform Orchestrator.php:103-117,
Load AdapterFactory.php:73).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wp_etl_migration_spark.functions import text as tf
from wp_etl_migration_spark.operators.cleaning import string_to_null
from wp_etl_migration_spark.operators.prefix import prefix_all, select_prefix
from wp_etl_migration_spark.operators.rename import rename_snake_scrub
from wp_etl_migration_spark.plans.config import load_yaml
from wp_etl_migration_spark.plans.pipeline import (
    JobConfig, JobReport, select_jobs, timed_count, validate_dag)
from wp_etl_migration_spark.sinks import files as fsink
from wp_etl_migration_spark.sinks import ledger as lsink
from wp_etl_migration_spark.sources import files as fsrc

Transform = Callable[[DataFrame, dict[str, Any]], DataFrame]
Loader = Callable[[DataFrame, dict[str, Any], "Runner"], None]

_TRANSFORMS: dict[str, Transform] = {}
_LOADERS: dict[str, Loader] = {}
_PIPELINES: dict[str, type["TransformPipeline"]] = {}


class TransformPipeline:
    """Class-based transform plugin with the reference's lifecycle
    (prepare → run → finalize, TransformationPipeline.php:15-59 /
    BaseTransformationPipeline.php:24-88). Subclass, override ``run``
    (and optionally prepare/finalize), register with
    ``register_pipeline``; a YAML job references it as
    ``transform: [{pipeline: <name>}]``."""

    def __init__(self, job_config: dict[str, Any] | None = None):
        self.job_config = job_config or {}

    def prepare(self, df: DataFrame) -> DataFrame:
        return df

    def run(self, df: DataFrame) -> DataFrame:
        return df

    def finalize(self, df: DataFrame) -> DataFrame:
        return df

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.finalize(self.run(self.prepare(df)))


def register_pipeline(name: str):
    """Class decorator: register a TransformPipeline under a config
    name (the plugin hook YAML plans resolve pipelines through)."""
    def deco(cls: type[TransformPipeline]) -> type[TransformPipeline]:
        _PIPELINES[name] = cls
        return cls
    return deco


def register_transform(name: str):
    """Decorator: register a row/frame transform for YAML plans — the
    F12 simple_transformer plugin hook."""
    def deco(fn: Transform) -> Transform:
        _TRANSFORMS[name] = fn
        return fn
    return deco


def register_loader(name: str):
    """Decorator: register a custom loader (sink) for YAML plans — the
    L14 custom-loader plugin hook."""
    def deco(fn: Loader) -> Loader:
        _LOADERS[name] = fn
        return fn
    return deco


def _c(name: str):
    return F.col("`" + name + "`")


# ------------------------------------------------------ built-in transforms

@register_transform("with_column")
def _t_with_column(df, args):
    """P1 withEntry: add/replace a column from a SQL expression."""
    return df.withColumn(args["name"], F.expr(args["expr"]))


@register_transform("slugify")
def _t_slugify(df, args):
    return df.withColumn(args.get("into", args["column"]),
                         tf.to_slug(_c(args["column"])))


@register_transform("split")
def _t_split(df, args):
    return df.withColumn(args.get("into", args["column"]),
                         tf.split_trim(_c(args["column"]),
                                       args.get("delimiter", ",")))


@register_transform("nullif")
def _t_nullif(df, args):
    return df.withColumn(args["column"],
                         tf.nullif_value(_c(args["column"]), args["value"]))


@register_transform("string_to_null")
def _t_string_to_null(df, args):
    return string_to_null(df, args["value"], args.get("columns"))


@register_transform("select_prefix")
def _t_select_prefix(df, args):
    return select_prefix(df, args["prefix"], strip=args.get("strip"))


@register_transform("rename")
def _t_rename(df, args):
    return df.withColumnRenamed(args["from"], args["to"])


@register_transform("drop")
def _t_drop(df, args):
    """P6 skip_fields."""
    cols = args if isinstance(args, list) else args["columns"]
    return df.drop(*cols)


# ----------------------------------- LLM-pipeline transforms (YAML-usable)

@register_transform("scrub_pii")
def _t_scrub_pii(df, args):
    from wp_etl_migration_spark.operators.pii import scrub_pii
    return df.withColumn(args.get("into", args["column"]),
                         scrub_pii(_c(args["column"])))


@register_transform("gopher_gate")
def _t_gopher_gate(df, args):
    from wp_etl_migration_spark.operators.textstats import gopher_rules
    knobs = {k: args[k] for k in (
        "min_words", "max_words", "min_mean_word_len", "max_mean_word_len",
        "max_symbol_ratio", "max_bullet_ratio", "max_ellipsis_ratio",
        "min_alpha_ratio", "min_stopword_hits") if k in args}
    return df.where(gopher_rules(_c(args["column"]), **knobs)["passes"])


@register_transform("lang_id")
def _t_lang_id(df, args):
    from wp_etl_migration_spark.operators.textstats import lang_id
    return df.withColumn(args.get("into", "lang_pred"),
                         lang_id(_c(args["column"])))


@register_transform("hash_sample")
def _t_hash_sample(df, args):
    from wp_etl_migration_spark.operators.sampling import hash_sample
    return hash_sample(df, args["key"], float(args["fraction"]),
                       args.get("salt", ""))


@register_transform("exact_dedup")
def _t_exact_dedup(df, args):
    from wp_etl_migration_spark.operators.dedup import exact_dedup
    keep = exact_dedup(df, args["key"], args["columns"])
    return df.join(keep, args["key"], "left_semi")


# --------------------------------------------------------- built-in loaders

@register_loader("json")
def _l_json(df, args, runner):
    fsink.write_json(df, runner.destination(args, "json"),
                     prefix=args.get("prefix"),
                     single_file=bool(args.get("single_file")),
                     pretty=bool(args.get("pretty")))


@register_loader("csv")
def _l_csv(df, args, runner):
    fsink.write_csv(df, runner.destination(args, "csv"),
                    prefix=args.get("prefix"))


@register_loader("parquet")
def _l_parquet(df, args, runner):
    fsink.write_parquet(df, runner.destination(args, "parquet"),
                        partition_by=args.get("partition_by"))


@register_loader("ledger")
def _l_ledger(df, args, runner):
    lsink.write_ledger(df, runner.output_dir, runner.current_job,
                       prefix=args.get("prefix", "ledger."))


# ------------------------------------------------------------------ runner

class Runner:
    """Execute a migration config end-to-end.

    ``run(dry_run=True)`` validates + previews without side effects
    (≙ ProcessCommand.php:145-152); ``analyze()`` counts each job's
    extract (≙ ProcessCommand.php:403-494).
    """

    def __init__(self, spark: SparkSession, config: dict[str, Any] | str,
                 output_dir: str = "output"):
        self.spark = spark
        if isinstance(config, str):
            config = load_yaml(config)
        self.config = config
        self.jobs = [JobConfig.from_dict(d)
                     for d in config.get("migration", [])]
        validate_dag(self.jobs)
        self.output_dir = output_dir
        self.current_job = ""

    # -- composition (lazy) --------------------------------------------

    def extract(self, job: JobConfig) -> DataFrame:
        """Scan + normalize: snake_case/scrub renames then the namespace
        prefix (≙ Extract Orchestrator.php:125-130, DataNormalizer)."""
        ex = job.extract
        adapter, src = ex.get("adapter", "parquet"), ex.get("source")
        opts = ex.get("options", {}) or {}
        if adapter == "csv":
            df = fsrc.from_csv(self.spark, src, **opts)
        elif adapter == "json":
            df = fsrc.from_json(self.spark, src, **opts)
        elif adapter == "xml":
            # args.xmlNodePath ≙ AdapterFactory.php:152-169 — full-path
            # anchored selection; bare rowTag matches at any depth.
            node_path = opts.pop("xmlNodePath", None)
            row_tag = opts.pop("rowTag", None if node_path else "item")
            df = fsrc.from_xml(self.spark, src, row_tag,
                               node_path=node_path, **opts)
        elif adapter == "parquet":
            df = fsrc.from_parquet(self.spark, src)
        elif adapter == "jdbc":
            # Live-database extract (≙ the reference's $wpdb reads):
            # source = table name, options carry url/driver/credentials
            # and the parallel-read knobs (partition_column, bounds).
            from wp_etl_migration_spark.sources.jdbc import from_jdbc

            df = from_jdbc(self.spark, opts.pop("url"), src, **opts)
        elif adapter == "memory":
            df = self.spark.createDataFrame(ex["rows"],
                                            schema=ex.get("schema"))
        else:
            raise ValueError(f"unknown extract adapter '{adapter}'")
        df = rename_snake_scrub(df)
        prefix = ex.get("prefix", "legacy.")
        if prefix:
            df = prefix_all(df, prefix)
        # Ledger dependency (J9): expose the upstream job's ledger as a
        # broadcast-joinable frame via a config hook.
        dep = job.depends_on
        if dep and ex.get("join_ledger"):
            led = lsink.read_latest_ledger(self.spark, self.output_dir, dep)
            if led is not None:
                df = df.join(F.broadcast(led),
                             on=ex["join_ledger"], how="left")
        # Incremental extract: drop rows this job's own ledger already
        # recorded — the set-wise form of the reference's per-row
        # lookup-before-insert (one anti-join against the audit trail
        # instead of N probe queries). Config:
        #   incremental_key: {source: legacy.id, ledger: source_id}
        # (source = post-prefix scan column; ledger = stripped ledger
        # field; a bare string means both sides share the name).
        inc_key = ex.get("incremental_key")
        if inc_key:
            if isinstance(inc_key, dict):
                src_col, led_col = inc_key["source"], inc_key["ledger"]
            else:
                src_col = led_col = inc_key
            own = lsink.read_latest_ledger(self.spark, self.output_dir,
                                           job.name)
            if own is not None and led_col in own.columns:
                seen = (own.select(F.col(led_col).alias("__seen"))
                        .distinct())
                df = df.join(
                    F.broadcast(seen),
                    F.col("`" + src_col + "`") == F.col("__seen"),
                    "left_anti")
        return df

    def transform(self, df: DataFrame, job: JobConfig) -> DataFrame:
        for step in job.transform:
            if isinstance(step, str):
                name, args = step, {}
            else:
                name, args = next(iter(step.items()))
            if name == "pipeline":
                # Class plugin ≙ YAML `pipeline: <FQCN>`
                # (Transform Orchestrator.php:103-117).
                pname = args if isinstance(args, str) else args["name"]
                if pname not in _PIPELINES:
                    raise ValueError(f"unknown pipeline '{pname}'")
                df = _PIPELINES[pname](job.__dict__)(df)
                continue
            if name not in _TRANSFORMS:
                raise ValueError(f"unknown transform '{name}'")
            df = _TRANSFORMS[name](df, args or {})
        return df

    def compose(self, job: JobConfig) -> DataFrame:
        """Extract + transform + engine uid (≙ Load Orchestrator.php:100)."""
        df = self.transform(self.extract(job), job)
        return df.withColumn(lsink.UID_COL, F.expr("uuid()"))

    # -- execution ------------------------------------------------------

    def destination(self, args: dict[str, Any], ext: str) -> str:
        if "destination" in args:
            return args["destination"]
        return fsink.destination(self.output_dir, self.current_job, ext,
                                 overwrite=args.get("overwrite", True))

    def load(self, df: DataFrame, job: JobConfig) -> None:
        for loader in job.load:
            adapter = loader.get("adapter", "json")
            if adapter not in _LOADERS:
                raise ValueError(f"unknown loader '{adapter}'")
            _LOADERS[adapter](df, loader, self)

    def run(self, include: list[str] | None = None,
            skip: list[str] | None = None,
            dry_run: bool = False) -> list[JobReport]:
        reports = []
        for job in select_jobs(self.jobs, include, skip):
            self.current_job = job.name
            t0 = time.monotonic()
            df = self.compose(job)
            if dry_run:
                _ = df.schema  # force full plan analysis, no execution
                reports.append(JobReport(job.name, -1, 0.0))
                continue
            self.load(df, job)
            reports.append(JobReport(
                job.name, -1, round(time.monotonic() - t0, 3)))
        return reports

    def analyze(self) -> list[JobReport]:
        """Row counts per job's extract (pre-load), timed."""
        out = []
        for job in select_jobs(self.jobs):
            self.current_job = job.name
            n, secs = timed_count(self.extract(job))
            out.append(JobReport(job.name, n, secs))
        return out


# Register the canned per-entity presets (plans/presets.py) so YAML
# jobs can reference them — `transform: [{pipeline: wordpress_post}]`
# — without the caller importing the module first. Import at module
# bottom: presets subclasses TransformPipeline defined above.
from wp_etl_migration_spark.plans import presets as _presets  # noqa: E402,F401
