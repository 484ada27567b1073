"""Bucketed-table helpers: pre-shuffled storage for co-located joins.

The reference's equivalent is index-aligned partitions with known divisions
(sorted-merge path, ``/root/reference/dask_expr/_merge.py:205-215,254-259``
— both sides partitioned the same way ⇒ blockwise join, no shuffle).  In
Spark the same contract is a **bucketed table**: rows hash-partitioned into
a fixed bucket count on the join key at WRITE time, so every subsequent
join/groupBy on that key elides its Exchange entirely — the single biggest
shuffle saving available for repeatedly-joined 100 TB fact tables.

Bucket counts must match on both sides of a join; pick a count that keeps
(table_size / buckets) near the 128 MiB partition target.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-bucketed) parquet
    table in the session catalog/warehouse."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if mode == "overwrite":
        # a managed-table location can survive from a previous session whose
        # in-memory catalog is gone; clear both catalog entry and location
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(warehouse.removeprefix("file:"), table.split(".")[-1])
        if os.path.exists(loc):
            shutil.rmtree(loc)
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; Spark's scan reports the bucket
    distribution so Catalyst can elide exchanges."""
    return spark.table(table)
