"""SparkSession construction tuned for this engine.

Defaults follow the public Spark docs' local-mode guidance: shuffle
partitions ≈ cores (not 200), AQE on (runtime coalesce + skew-join),
Arrow on (our hot path is pandas UDFs), UTC session TZ (so timestamp
comparisons against the DuckDB oracle are stable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "semtools_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) else all cores.
    On a real cluster these settings are supplied by spark-submit instead;
    nothing here is local-mode-only semantics.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    # One BLAS/OMP thread per Python worker: N workers each spawning
    # cpu_count() BLAS threads oversubscribes the box N-fold and destroys
    # pandas-UDF scaling (parallelism comes from Spark tasks, not BLAS).
    # Inherited by pyspark worker daemons forked under this process.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if shuffle_partitions is None:
        # cores, not Spark's default 200: right-sizes local shuffles; a real
        # cluster overrides via --conf (AQE coalesces down when over-provisioned)
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
