"""SparkSession factory with scale-appropriate defaults.

The engine targets a multi-executor cluster at ~100 TB; locally we run
``local[N]``.  Every config here is cluster-safe: AQE handles runtime
coalescing/skew, shuffle partitions default to the local core count but are
overridable, and Arrow is enabled for the (few) Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# spark.driver.memory set via SparkSession.builder is a NO-OP when the JVM is
# launched from a plain Python process (the heap is fixed before the conf is
# read). Injecting it into PYSPARK_SUBMIT_ARGS before the gateway launches is
# the one way to size the local-mode driver heap from Python. Harmless if a
# JVM already exists (getOrCreate reuses it) or under spark-submit (which
# owns these args).
if "--driver-memory" not in os.environ.get("PYSPARK_SUBMIT_ARGS", ""):
    _mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    _rest = os.environ.get("PYSPARK_SUBMIT_ARGS", "").replace("pyspark-shell", "").strip()
    os.environ["PYSPARK_SUBMIT_ARGS"] = " ".join(
        p for p in (f"--driver-memory {_mem}", _rest, "pyspark-shell") if p
    )


def get_spark(
    app_name: str = "mb_crdb_cdc_dlgen2_synapse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults favor the 100 TB design point: AQE on (dynamic coalescing +
    skew-join splitting), broadcast threshold generous enough that every
    dimension table in the star schema broadcasts, UTC session timezone so
    event-time semantics match the oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(cpus)
    # Shuffle/spill through tmpfs when available: local-mode shuffles are
    # disk-bound through spark.local.dir, and page-cache-pressured block
    # storage makes join times erratic; RAM-backed local dirs remove that
    # variance (a cluster deployment instead sizes NVMe local dirs).
    local_dir = None
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        probe = os.path.join(shm, ".probe")
        with open(probe, "w") as f:
            f.write("x")
        os.remove(probe)
        local_dir = shm
    except OSError:
        pass

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # split SMALL single-file tables across cores: CPU-heavy per-row
        # pipelines (shingling, segment hashing) otherwise serialize on one
        # task when the input is one compact parquet file; on a cluster this
        # likewise spreads small inputs across executors instead of pinning
        # them to one
        .config("spark.sql.files.minPartitionNum", str(int(cpus)))
        .config("spark.ui.enabled", "false")
        # driver heap is set via PYSPARK_SUBMIT_ARGS above (builder-time
        # spark.driver.memory cannot resize an already-launched JVM)
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
