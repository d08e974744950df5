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
    master: str | None = None,
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
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep Arrow batches SMALL (2048 rows, ~6MB at web-page row weight):
        # with the default 16384-row batches and ~KB rows, every worker slot
        # churns 50MB+ buffers per batch; allocator page-return
        # (munmap/madvise) across 32 Python workers triggers cross-CPU TLB
        # shootdowns that turn high-core-count runs into 80-97%-sys-time
        # kernel storms (measured: 5x anti-scaling from 8→32 cores). 2048
        # rows keeps the JVM↔Python pipeline fine-grained and the allocator
        # steady; the per-batch overhead at light row weights is noise.
        # maxBytesPerBatch alone does NOT bound the scalar-pandas-UDF eval
        # path in 4.1 (measured), so the record cap is the effective knob.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "8388608b")
        # zstd intermediates: 35% fewer bytes than snappy on the web-text
        # corpus (634->413 MB per 1M pages) at equal best-of-trials wall on
        # this box; on a real cluster the intermediate tables hit disk and
        # the shuffle network, where a third fewer bytes is a direct win
        # (CPU for compression is the abundant resource at high core
        # counts; bandwidth is the scarce one).
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_spark_cluster(
    app_name: str,
    n_executors: int,
    cores_per_executor: int = 4,
    executor_mem_mb: int = 4096,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Multi-executor session via Spark's ``local-cluster`` master: real
    separate executor JVMs (one worker per executor) on this machine —
    the faithful single-box proxy for "N executors vs 4N executors"
    scaling runs (plain local[k] shares one JVM across all cores, which
    measures the JVM's thread ceiling, not the job's parallelism)."""
    import pyspark

    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    total = n_executors * cores_per_executor
    conf = {
        "spark.executor.memory": f"{max(1024, executor_mem_mb - 512)}m",
        **(extra_conf or {}),
    }
    spark = get_spark(
        app_name,
        cpus=total,
        shuffle_partitions=shuffle_partitions or total,
        extra_conf=conf,
        master=f"local-cluster[{n_executors},{cores_per_executor},{executor_mem_mb}]",
    )
    # Ship this package to the executors' Python workers — the
    # spark-submit --py-files deployment story (north rule), done inline.
    spark.sparkContext.addPyFile(_package_zip())
    return spark


def _package_zip() -> str:
    """Zip semtools_spark for --py-files-style distribution to executors."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "semtools_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "semtools_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return out
