"""SparkSession factory tuned for the target execution profile.

Local testing runs on ``local[N]``; the same settings are what we would
ship to a 1000-executor cluster: AQE enabled (runtime coalescing + skew
join handling), Arrow for any pandas-UDF exchange, and shuffle
partitions sized from available parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pygeoapi_ingestor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local core count so the bench driver
    controls parallelism.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one-ish partition per core locally; on a real cluster this is
        # overridden to ~2-3x total executor cores.
        shuffle_partitions = max(cpus, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # broadcast/shuffle state is freed on driver GC; the 30-min
        # default periodicGC outlives a whole catalog pass (or a
        # scheduler tick), letting dead state pile up — observed as
        # random 2-3x latency outliers. 2 min keeps a long-lived
        # ingestor service at steady-state latency.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Catalyst canonicalization / constraint propagation recurses
        # per expression-tree level (CommutativeExpression.
        # orderCommutative and friends); the catalog's widest JVM-side
        # expressions (64-term dot-product Add chains, kept left-
        # associated ON PURPOSE for bit-identity with the strict-left-
        # fold oracles) sit near the default ~1 MiB thread-stack limit
        # — an identical-code bench run crashed with a canonicalization
        # StackOverflow in the r11 driver window while passing
        # in-session. 32 MiB makes plan analysis depth a non-factor.
        # -Xss applies to every JVM thread (py4j handlers included);
        # heap flags stay out of extraJavaOptions per Spark's contract.
        #
        # +ExplicitGCInvokesConcurrent (r14 root-cause of the r13
        # local[32] "regression"): Spark's ContextCleaner periodicGC —
        # which the 2-min interval above fires on purpose — calls
        # System.gc(), and under Java 17's default G1 an explicit GC is
        # a FULL stop-the-world collection. On this driver's 48 GiB
        # heap those pauses measured up to 33.8 s (tools/bench_probe.py,
        # G1 Old Generation MXBean: 1 collection = 33771 ms inside a
        # 117 s query cell), landing on random timed cells; pause cost
        # scales with allocation churn, i.e. with task count, so
        # local[32] suffered ~4x over local[8] — the entire r13
        # "8 cores beats 32" inversion. With the flag, an explicit GC
        # becomes a concurrent G1 cycle: reference processing (what the
        # ContextCleaner actually needs — its weak refs get enqueued)
        # still happens, nothing pauses. A/B on 20 keys at local[32]:
        # 225 s wall / 35.3 s GC pauses -> 69 s wall / 0.6 s GC.
        # The same applies to any long-lived 100 TB driver: periodicGC
        # without this flag trades broadcast-state hygiene for
        # multi-second full pauses at exactly the heap sizes where both
        # matter.
        .config(
            "spark.driver.extraJavaOptions",
            "-Xss32m -XX:+ExplicitGCInvokesConcurrent",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-Xss32m -XX:+ExplicitGCInvokesConcurrent",
        )
        # The app-status store keeps the last 1000 SQL executions WITH
        # their full plan graphs even when the UI is off; this catalog's
        # analyzed plans are large (dedup fixpoints, composed curation
        # lineages), and a full bench pass issues ~1500 executions —
        # the retained graphs alone ran a 16 GiB driver heap out of
        # memory in the r11 driver window (OOM inside Catalyst
        # canonicalization allocation, BENCH_r11). Cap the history: a
        # service needs recent-N diagnostics, not an unbounded museum.
        .config("spark.sql.ui.retainedExecutions", "64")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "5000")
        # Catalyst constraint propagation (getAllValidConstraints /
        # InferFiltersFromConstraints) is super-linear in expression
        # width: alias substitution re-canonicalizes every constraint
        # per Project alias, and on this catalog's wide flat-column
        # plans (64-term dot-product chains under joins) one logical
        # plan was observed burning 16+ DRIVER-MINUTES (and the r11
        # driver window's heap) inside ExpressionSet.map before any
        # task ran. Every filter in the catalog is written explicitly,
        # so inferred constraints buy nothing here — and no 100 TB
        # deployment can afford minutes of driver-side optimizer time
        # per query. Known upstream pathology (SPARK-19846 family).
        .config("spark.sql.constraintPropagation.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        # the -Xss32m pin (r11 canonicalization StackOverflow fix) and
        # the concurrent-explicit-GC pin (r14 full-pause fix) are both
        # load-bearing: a caller adding its own JVM flags must not
        # silently REPLACE them (ADVICE r12) — merge, keeping the
        # caller's flags after ours so they still win any same-flag
        # conflict (-XX:-ExplicitGCInvokesConcurrent counts as the
        # caller providing the flag).
        if k in ("spark.driver.extraJavaOptions", "spark.executor.extraJavaOptions"):
            if "ExplicitGCInvokesConcurrent" not in v:
                v = f"-XX:+ExplicitGCInvokesConcurrent {v}"
            if "-Xss" not in v:
                v = f"-Xss32m {v}"
        builder = builder.config(k, v)
    return builder.getOrCreate()


def spread_if_narrow(df):
    """Repartition to the session's core count ONLY when the input has
    fewer partitions — a local single-file parquet arrives as one
    partition and would serialize any all-pairs / heavy-projection
    stage on one thread, while a production input with thousands of
    partitions must keep its partitioning (no gratuitous full-data
    shuffle, no parallelism collapse)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Required by the pandas-UDF operators (SPI, multimodal decode): their
    closures reference this package by module name, and executor workers
    don't share the driver's sys.path (e.g. when the driver process runs
    from a different cwd). Idempotent per session.
    """
    marker = "spark.pygeoapi_ingestor_spark.shipped"
    try:
        if spark.conf.get(marker, None) == "true":
            return
    except Exception:
        pass
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zip_base = os.path.join(
        tempfile.gettempdir(), f"pygeoapi_ingestor_spark_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        zip_base, "zip", root_dir=parent, base_dir="pygeoapi_ingestor_spark"
    )
    spark.sparkContext.addPyFile(zip_path)
    spark.conf.set(marker, "true")


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the standard table set from a scale-factor directory.

    Returns ``{name: DataFrame}``. Reads are lazy; column pruning and
    predicate pushdown reach the parquet scans because we never cache or
    materialize here.
    """
    from pygeoapi_ingestor_spark.sources.readers import read_table

    return {t: read_table(spark, sf_dir, t) for t in TABLES}
