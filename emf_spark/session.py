"""SparkSession factory tuned for the pipeline's shuffle/skew profile.

Defaults follow the north rule: AQE on (runtime re-plan + skew split),
explicit shuffle-partition sizing, Arrow enabled for pandas UDF exchange.
On a real cluster these same settings apply unchanged; only ``master``
and memory sizing differ (supplied by spark-submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # Arrow transport for pandas UDFs (the detokenize hot path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # AQE: runtime coalescing, skew-join splitting (north rule).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    # Nested-schema pruning so from_json/struct projections prune at scan.
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # Partial aggregation is the reference's in-memory map equivalent;
    # keep it on (default) and make the scan split size explicit.
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "emf_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or 32.
    ``shuffle_partitions`` defaults to 2x cpus — small enough to avoid
    tiny-task overhead at test SFs, and AQE coalesces further; at real
    cluster scale the submitter overrides it to ~2-3x total cores.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or 2 * cpus
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf["spark.default.parallelism"] = str(cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
