"""SparkSession factory tuned for the record-linkage workload.

Replaces the reference's env-var connection factory
(/root/reference/entity_resolution_engine/db/connections.py:14-18) with
a SparkSession builder.  Every knob here exists for a scale reason:

- AQE + skew-join: the blocking self-join is skewed (web domains are
  Zipfian) — AQE splits skewed shuffle partitions at runtime on top of
  our explicit salting (operators/blocking.py).
- Arrow: all Python compute is Arrow-batched pandas UDFs; row-at-a-time
  Python UDFs are banned in this codebase.
- shuffle.partitions ~ cores locally; on a real cluster this is set to
  2-3x total cores (or left to AQE coalescing).
- UTC session timezone: required for byte-stable comparison against the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "entity_resolution_engine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a real cluster it is supplied by spark-submit and
    this argument is left ``None`` while ``SparkSession.builder`` picks
    up the cluster config.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~1x threads. Cluster deployments override via conf.
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # NOTE (round 6): don't be tempted to raise scan parallelism for
    # small single-file inputs via spark.sql.files.openCostInBytes —
    # a parquet ROW GROUP is assigned to the byte-range split holding
    # its midpoint, so a one-row-group file still lands entirely in one
    # task and the extra splits are empty (they only defeat the
    # partition-count check in sources.readers.fan_out, which is the
    # actual fix for CPU-heavy stages over such inputs).
    # Shuffle/spill dirs on tmpfs, OPT-IN via SPARK_GRAFT_LOCAL_DIR:
    # this sandbox's /tmp sits on a throttled virtio disk, which
    # serializes every shuffle write regardless of core count
    # (measured: the block+score phase ran 119s at BOTH local[8] and
    # local[32] with /tmp spills — zero scaling), so the repo's own
    # entry points (bench.py, scripts/bench_scaling.py, tests) set the
    # env var to /dev/shm/spark-local.  The library itself defaults to
    # Spark's disk-backed spill dirs: an unconditional tmpfs redirect
    # would ENOSPC any real deployment whose shuffle spill exceeds the
    # tmpfs (typically 50% of RAM) — round-2 ADVICE.  On a real
    # cluster this is the NVMe local-disk conf.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Tear down the active session (used by the scaling bench, which
    needs back-to-back sessions at different parallelism levels)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # Spark caches the JVM gateway; a fresh master needs a clean slate.
        SparkSession._instantiatedSession = None  # noqa: SLF001
        SparkSession._activeSession = None  # noqa: SLF001
