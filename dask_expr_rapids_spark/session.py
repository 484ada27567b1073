"""SparkSession factory tuned for the engine.

The reference (rjzamora/dask-expr-rapids) defaults to a threaded scheduler
with 128 MiB target partitions (``/root/reference/dask_expr/io/parquet.py:518``,
``_shuffle.py:745``).  Here the equivalent knobs are Spark SQL confs; we set
them once, scale-consciously:

* AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast-join demotion/promotion) — subsumes the reference's ``_tune_down``
  split_out heuristic (``_groupby.py:142-150``) and its partition-count
  broadcast heuristic (``_merge.py:172-192``).
* ``files.maxPartitionBytes`` = 128 MiB to mirror the reference's blocksize.
* Arrow enabled for every pandas interchange (the slow-path escape hatch).
* Session timezone pinned to UTC so timestamp semantics are stable across
  engines (the DuckDB oracle reads parquet timestamps as naive/UTC).

On a real cluster the same builder is used; only ``master`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Mirrors the reference's 128 MiB target partition size.
_TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def get_spark(
    app_name: str = "dask-expr-rapids-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-tuned defaults.

    Local testing uses ``local[$SPARK_GRAFT_CPUS]``; production would pass a
    cluster master.  All confs below are safe on a 1000-executor cluster.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- optimizer / AQE ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- IO ---
        .config("spark.sql.files.maxPartitionBytes", str(_TARGET_PARTITION_BYTES))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- python interchange (pandas-UDF slow path) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- determinism for the differential oracle ---
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) (events.ts) is not a native Spark type:
        # read as raw nanosecond longs; load_table converts to a microsecond
        # timestamp with floor semantics (matches DuckDB's ns→us cast).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive timestamp[us] parquet (the other encoding events.ts has
        # shipped with) would otherwise infer as TIMESTAMP_NTZ, which
        # ``unix_micros`` and ``withWatermark`` reject.  Read it as a
        # session-tz timestamp; exact under the pinned UTC tz above.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # 16g: headroom for 32 concurrent local tasks so cache churn from a
        # heavy query (dedup pipelines persist gram/band intermediates) does
        # not push the old gen to the wall and tax the NEXT query with full
        # GCs.  Cluster-representative (16-64 g/executor is the common band).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
