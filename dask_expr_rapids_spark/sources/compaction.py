"""Small-files compaction — the table-maintenance operation every 100 TB
parquet store needs: streaming sinks, per-partition writers, and
incremental ingest all fragment a dataset into files far below the
HDFS-block / scan-efficient size, and scan cost then becomes file-open
cost (driver listing, footer reads, task-per-file scheduling).

Not in the reference (its io surface stops at read/write,
``/root/reference/dask_expr/io/parquet.py``); this is the operational
layer a drop-in engine needs around those sources.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes of a dataset directory via the Hadoop
    FileSystem API — a driver METADATA operation (no data read), valid
    for any Hadoop-compatible FS (local, HDFS, S3A...)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def dataset_file_count(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Number of data files under ``path`` (recursive, metadata-only)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(suffix):
            n += 1
    return n


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
) -> DataFrame:
    """Rewrite a fragmented parquet dataset into ~``target_bytes`` files.

    The output file count is sized from the MEASURED dataset bytes
    (ceil(total/target), floor 1) — never a constant (the repo-wide
    sizing rule).  The rewrite itself is one executor-parallel pass:
    ``coalesce`` (narrow, no shuffle) when folding many read-splits into
    fewer files — the overwhelmingly common case — and ``repartition``
    only when the dataset needs MORE files than the scan produced splits
    (tiny datasets read as one split).  Parquet is splittable, so
    downstream scan parallelism is preserved regardless of file count.

    Returns the lazy DataFrame over the compacted destination.
    """
    df = spark.read.parquet(src_path)
    n_out = max(1, math.ceil(dataset_bytes(spark, src_path) / target_bytes))
    n_splits = df.rdd.getNumPartitions()
    sized = df.coalesce(n_out) if n_splits >= n_out else df.repartition(n_out)
    sized.write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)
