"""SparkSession construction tuned for the engine.

The reference runs one PHP thread (SURVEY §4); we instead target a
multi-executor cluster. Defaults below are the scale-relevant knobs:
AQE (runtime re-planning + skew-join splitting), adaptive shuffle
partition coalescing, Arrow for any pandas-UDF exchange, and UTC session
time so timestamp semantics are stable across engines and clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied to every session we build AND (where runtime-settable)
#: re-asserted on sessions handed to us by a driver.
ENGINE_CONF = {
    "spark.sql.session.timeZone": "UTC",
    # Parquet TIMESTAMP(NANOS) (events.ts) is otherwise unreadable; read
    # as long and convert with integer division (sources.tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Untagged parquet timestamp[us] must read as TIMESTAMP (UTC session
    # tz), not TIMESTAMP_NTZ — unix_micros() and the DuckDB oracle both
    # assume instant semantics.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # At 100 TB the default 200 shuffle partitions is far too low and on
    # local[32] it is too high; make it explicit and env-overridable.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}

#: Conf keys that are safe to (re)set at runtime on an existing session.
_RUNTIME_KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.parquet.inferTimestampNTZ.enabled",
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.shuffle.partitions",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.files.maxPartitionBytes",
)


def get_spark(app_name: str = "wp-etl-migration-spark",
              master: str | None = None,
              **extra_conf: str) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    # Local-mode JVM heap: Spark's 1g default is far below this box's
    # RAM and GC-thrashes the 10k+-vector kernels (the sf1 study tools
    # pass 48g explicitly). Only effective at JVM launch — a no-op on
    # an already-running session; on a real cluster the deployment
    # sets executor/driver memory instead.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem and "spark.driver.memory" not in extra_conf:
        builder = builder.config("spark.driver.memory", mem)
    for k, v in {**ENGINE_CONF, **extra_conf}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Opt-in reliable checkpointing for iterative operators: with a
    # checkpoint dir registered (HDFS/S3 path on a cluster), every
    # operators.checkpoint.pin() call switches from executor-local
    # blocks to fault-tolerant checkpoints (see operators/checkpoint.py).
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt and spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Re-assert runtime-settable engine conf on an existing session.

    Called at the top of every public query entry point so behavior is
    deterministic even on a session we did not construct (e.g. the
    correctness driver's). UTC session time in particular is required for
    timestamp formatting to agree with the DuckDB oracle.
    """
    for k in _RUNTIME_KEYS:
        try:
            spark.conf.set(k, ENGINE_CONF[k])
        except Exception:
            pass  # immutable in some deployments; defaults are acceptable
    return spark
