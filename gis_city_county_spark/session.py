"""SparkSession factory with scale-appropriate defaults.

Local test runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same configs apply (AQE, UTC timestamps, Arrow) and the master/memory
settings come from the deploy environment instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gis-city-county-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults chosen for correctness-vs-oracle and local throughput:

    - ``spark.sql.session.timeZone=UTC``: DuckDB timestamps are
      UTC-naive; pinning the session TZ makes them comparable.
    - AQE on (runtime coalesce, skew-join splitting) — the same flags
      that matter at cluster scale.
    - shuffle partitions ~= cores for local mode (the 200 default
      over-parallelizes small shuffles).
    - Arrow on: every pandas interchange (mapInPandas/applyInPandas)
      moves columnar batches, not pickled rows.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Long-lived multi-query drivers accumulate shuffle/broadcast
        # registrations that the ContextCleaner only releases when the
        # driver JVM happens to GC (default periodic GC: 30 min). On a
        # session running hundreds of queries that backlog degrades
        # later Python-exchange stages by seconds; a 60s floor keeps
        # cleaner state bounded. Same flag matters for any production
        # driver serving a query stream.
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
