"""SparkSession factory.

One place to pin the configs the engine depends on:

- ``spark.sql.session.timeZone=UTC`` — the transcript `ts` axis is naive-UTC
  (parquet TIMESTAMP_NTZ); all epoch arithmetic assumes UTC.
- Arrow on — every custom compute path is a vectorized pandas UDF
  (BASELINE.json input_hint: "no per-row Python").
- AQE on, incl. skew-join handling — but hot-key salting is still explicit
  where the north_rule requires it (operators/asof.py, operators/salt.py).

At cluster scale the same factory is used by ``spark-submit --py-files``;
in this sandbox the master defaults to ``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "uncharted-ta1-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's required configs."""
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # WindowExec buffers one partition-key GROUP at a time; the default
        # in-memory threshold (4096 rows) pushes any conversation longer
        # than that into UnsafeExternalSorter's allocation-heavy page path.
        # The hybrid router bounds window groups at DEFAULT_HOT_THRESHOLD
        # (65,536) turns — larger conversations take the chunked/salted path
        # — so 131,072 keeps EVERY group in the plain in-memory array:
        # measured 0.69 -> 0.70+ scaling efficiency and ~12% faster
        # absolute (4M-turn featurize, local[4] and local[16]).
        .config("spark.sql.windowExec.buffer.in.memory.threshold", "131072")
    )
    if master.startswith("local-cluster") or master.startswith("spark://"):
        # true multi-executor mode: separate executor JVMs.  Executor heap
        # must fit the worker grant (local-cluster[N,C,MB]); python workers
        # import the engine from the --py-files artifact (built by
        # scripts/package_pyfiles.py) instead of the driver's sys.path.
        builder = builder.config(
            "spark.executor.memory", os.environ.get("SPARK_GRAFT_EXEC_MEM", "7g")
        )
        # Pre-touch executor heaps at JVM startup: on this Firecracker host
        # first-touch page faults are ~100x native and serialize per-mm, so
        # an executor that faults its window/shuffle buffers DURING the job
        # throttles every core it has.  Measured on the 8M-turn cluster
        # bench (1x4 vs 4x4 executors, same host window): 4-executor leg
        # 33.0s -> 18.4s, scaling efficiency 0.423 -> 0.752 from this flag
        # alone; the 1-executor leg is compute-bound and unchanged.  A real
        # multi-executor deployment pays this once at executor launch.
        # Override/extend via SPARK_GRAFT_EXTRA_CONF (applied last).
        builder = builder.config(
            "spark.executor.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_EXEC_JAVA_OPTS", "-XX:+AlwaysPreTouch"),
        )
        zip_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "dist",
            "uncharted_ta1_pipeline_spark.zip",
        )
    else:
        zip_path = None
    # local-mode shuffle spill to tmpfs when available (single-node sandbox;
    # a real cluster uses executor-local disks instead)
    if os.path.isdir("/dev/shm") and os.environ.get("SPARK_GRAFT_SHM", "1") == "1":
        shm = "/dev/shm/spark-graft-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    # last-wins ad-hoc overrides for bench/scaling experiments, e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.enabled=false;spark.foo=1"
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    if zip_path and os.path.isfile(zip_path):
        # addPyFile (not spark.submit.pyFiles on the builder): setting the
        # conf programmatically only appends the basename to the context's
        # _python_includes and copies the zip into the DRIVER's SparkFiles
        # root — distribution to executors is done by spark-submit itself.
        # addPyFile both ships the file to every executor and registers the
        # include, so the plain `python bench.py` + SPARK_GRAFT_MASTER
        # fallback works too; under spark-submit --py-files the call is a
        # harmless re-add of an already-distributed file.  (ADVICE r3)
        spark.sparkContext.addPyFile(zip_path)
    spark.sparkContext.setLogLevel("WARN")
    return spark
