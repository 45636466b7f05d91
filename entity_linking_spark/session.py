"""SparkSession factory with the configs this engine assumes.

Scale notes (the same builder is what a 1000-executor deployment would use,
minus master/memory which come from spark-submit):
  - AQE on: runtime coalescing + skew-join splitting are the first line of
    defense against conversation-level skew (north_rule names this).
  - Arrow on: every Python-side feature UDF is a vectorized pandas UDF.
  - shuffle.partitions is a *local* default; at cluster scale it is set to
    ~2-3x total cores via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "entity_linking_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Under spark-submit (detected via the Py4J gateway it launches) an
    # unspecified master defers to spark-submit's --master / conf; calling
    # builder.master() here would silently force local mode on the driver.
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not submitted:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None and master is not None:
        # local[N] → N-ish shuffle partitions; a real cluster overrides this.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
        # driver memory is only ours to set in local mode; under
        # spark-submit it comes from --driver-memory / conf
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
