"""Sources & sinks (SURVEY.md §2.1).

Reference parity map (citations into /root/reference):

* ``ReadParquet`` (``dask_expr/io/parquet.py:398-669``): row-group splitting,
  stats-based planning, column projection — all native in
  ``spark.read.parquet`` (FileSourceScanExec does row-group pruning, predicate
  pushdown, schema pruning in the driver).
* ``ReadCSV`` (``dask_expr/io/csv.py:8-66``) → ``spark.read.csv``.
* ``FromPandas`` (``dask_expr/io/io.py:302-419``) → ``spark.createDataFrame``
  (Arrow-accelerated).
* ``ToParquet`` (``dask_expr/io/parquet.py:90-395``) → ``df.write.parquet``
  with ``mode``/``partitionBy`` (reference ``partition_on``,
  ``io/parquet.py:204-213``).
* ``Timeseries`` (``dask_expr/datasets.py:13-241``) → ``spark.range`` +
  deterministic column generators, fully JVM-side (no Python in the loop).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan; column pruning expressed declaratively so Catalyst pushes
    the projection into the scan (``ReadSchema`` in ``.explain``)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    schema=None,
    **options,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def to_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_on: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_on:
        writer = writer.partitionBy(*partition_on)
    writer.parquet(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema=None,
    lines: bool = True,
    **options,
) -> DataFrame:
    """JSON-lines scan (reference ``read_json`` surface via dask; Spark's
    native JSON source).  Pass an explicit ``schema`` in production — schema
    inference costs an extra pass over the data and infers column ORDER from
    the first record, neither acceptable at 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    reader = reader.option("multiLine", str(not lines).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def to_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    """JSON-lines sink — executor-parallel writes, one file per task."""
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.json(path)


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """ORC scan (columnar, predicate/projection pushdown like parquet).
    Extension beyond the reference's io surface (csv/parquet/json/delayed,
    ``/root/reference/dask_expr/io/``) — warehouses mix parquet and ORC, so
    a drop-in engine needs both columnar formats."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def to_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_on: list[str] | None = None,
    compression: str = "zlib",
) -> None:
    """ORC sink — executor-parallel, one file per task, hive-partitionable."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_on:
        writer = writer.partitionBy(*partition_on)
    writer.orc(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Raw-text scan → one ``value: string`` row per line (or per file with
    ``wholetext=True``) — the ingest format of an LLM corpus before any
    structure exists.  Splittable per-file; schema is fixed so nothing is
    inferred.  Extension beyond the reference's io surface
    (``/root/reference/dask_expr/io/``)."""
    return spark.read.option("wholetext", str(wholetext).lower()).text(path)


def to_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Raw-text sink: exactly one string column, one line per row,
    executor-parallel.  Rows must not contain newlines (they would split
    on read-back) — normalize upstream; this sink writes verbatim."""
    if len(df.columns) != 1:
        raise ValueError(f"to_text requires exactly one column, got {df.columns}")
    df.write.mode(mode).text(path)


def from_pandas(spark: SparkSession, pdf: pd.DataFrame, npartitions: int | None = None) -> DataFrame:
    df = spark.createDataFrame(pdf)
    return df.repartition(npartitions) if npartitions else df


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize every on-disk timestamp encoding of ``col`` to a plain
    session-tz ``timestamp`` so downstream time semantics (``unix_micros``,
    ``withWatermark``, range windows) see ONE type:

    * parquet TIMESTAMP(NANOS) read as ns-longs under
      ``legacy.parquet.nanosAsLong`` → floor-converted to microseconds
      (matches DuckDB's CAST(ts_ns AS TIMESTAMP) truncation);
    * naive ``timestamp_ntz`` (plain ``timestamp[us]`` parquet) → cast to
      ``timestamp`` — exact under the pinned UTC session tz
      (``session.py``), so the DuckDB oracle sees identical instants;
    * already ``timestamp`` → untouched.
    """
    for field in df.schema.fields:
        if field.name == col:
            st = field.dataType.simpleString()
            if st == "bigint":
                df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
            elif st == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (not a Spark
        # type — read as ns-longs via the legacy conf, set defensively here
        # since it is runtime-settable) and as naive timestamp[us] (which
        # Spark infers as TIMESTAMP_NTZ unless inferTimestampNTZ is off).
        # Both paths normalize below; the conf also guards sessions built
        # without ``get_spark``.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_ts(df)


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than
    cores, so a CPU-bound downstream stage (hashing, shingling, vector math)
    uses the whole machine.

    Scans of files smaller than ``spark.sql.files.maxPartitionBytes`` yield
    ONE partition, which would serialize the entire pipeline on one core.
    At production scale the scan already yields >= cores splits and this is
    a no-op; the shuffle it introduces moves only the small input, never the
    (much larger) expanded intermediate.

    CAVEAT (round-9 lesson): a ``foreachBatch`` micro-batch frame is
    backed by the streaming source — its ``inputFiles()`` is EMPTY, so
    this heuristic returns it unchanged even though a
    ``maxFilesPerTrigger=1`` batch is one file = one partition.  Inside a
    streaming sink, repartition explicitly (see
    ``streaming/ops.py::run_lsh_neardup_ingest``); the silent single-core
    fallout cost a 7x drain slowdown before it was profiled.
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # estimate scan fan-out from driver-side file metadata (inputFiles +
    # maxPartitionBytes) instead of df.rdd.getNumPartitions(), which would
    # materialize the RDD lineage on every call
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        return df  # non-file sources (range, in-memory) are already spread
    mpb_raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    mpb = _parse_bytes(str(mpb_raw))
    total = 0
    for f in files:
        from urllib.parse import urlparse, unquote

        parsed = urlparse(f)
        if parsed.scheme not in ("", "file"):
            # remote filesystems (hdfs/s3/...) — no driver-side stat; fall
            # back to the physical partition count, which is exact
            total = None
            break
        p = unquote(parsed.path) or f
        try:
            total += os.path.getsize(p)
        except OSError:
            total = None
            break
    if total is not None:
        est = max(1, -(-total // mpb))
    else:
        est = df.rdd.getNumPartitions()
    return df.repartition(n) if est < n else df


def _parse_bytes(raw: str) -> int:
    """Parse a JVM byte-size conf value (``134217728``, ``128m``, ``1g``,
    ``256k``, ``512mb`` ...) into bytes.  Bare digits are bytes, matching
    Spark's ``JavaUtils.byteStringAsBytes``."""
    s = raw.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}
    num = s
    mult = 1
    for suffix in sorted(
        [u + "b" for u in units] + list(units) + ["b"], key=len, reverse=True
    ):
        if s.endswith(suffix):
            num = s[: -len(suffix)].strip()
            mult = units.get(suffix[0], 1)
            break
    try:
        return max(1, int(float(num) * mult))
    except ValueError:
        return 134217728


#: name vocabulary of the timeseries generator (reference dataset names,
#: ``datasets.py``); module-level so the SQL oracle can embed the same list
TS_NAMES = (
    "Alice", "Bob", "Charlie", "Dan", "Edith", "Frank", "George",
    "Hannah", "Ingrid", "Jerry", "Kevin", "Laura", "Michael", "Norbert",
    "Oliver", "Patricia", "Quinn", "Ray", "Sarah", "Tim", "Ursula",
    "Victor", "Wendy", "Xavier", "Yvonne", "Zelda",
)


def timeseries(
    spark: SparkSession,
    start: str = "2024-01-01",
    n_rows: int = 604_800,
    freq_seconds: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Synthetic timeseries source (reference ``Timeseries``,
    ``dask_expr/datasets.py:13-241``): timestamp grid + name/id/x/y columns.

    Entirely JVM-side: ``spark.range`` scales to any row count across
    executors.  All randomness is HASH-DERIVED (md5 of ``seed:row``), not
    ``F.rand``: every value is a pure function of (seed, row number), so
    the stream is bit-identical across partitionings, retries, cluster
    sizes — and across ENGINES, which lets the DuckDB oracle reproduce it
    exactly (the reference's per-partition RNG state,
    ``datasets.py:160-170``, is deterministic only within one engine).

    Determinism details: each md5 yields four independent 32-bit uniforms;
    ``u = m/2^32`` and ``x = m/2^31 - 1`` are exact dyadic doubles, and the
    id column is Irwin-Hall (sum of 4 uniforms ≈ normal, σ≈0.577) — sums of
    dyadic rationals stay exact, so no cross-engine float drift.
    """
    names = F.array(*[F.lit(n) for n in TS_NAMES])
    ha = F.md5(F.concat(F.lit(f"{seed}a:"), F.col("id").cast("string")))
    hb = F.md5(F.concat(F.lit(f"{seed}b:"), F.col("id").cast("string")))

    def u32(h, slot: int):
        return F.conv(F.substring(h, 1 + 8 * slot, 8), 16, 10).cast("double")

    u_name = u32(ha, 0) / 4294967296.0
    ih = (
        u32(ha, 1) + u32(ha, 2) + u32(ha, 3) + u32(hb, 0)
    ) / 4294967296.0  # Irwin-Hall sum in [0, 4)
    return (
        spark.range(n_rows)
        .select(
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(start).cast("timestamp")) + F.col("id") * freq_seconds
            ).alias("timestamp"),
            F.element_at(names, (F.floor(u_name * 26) + 1).cast("int")).alias("name"),
            (F.floor((ih - 2.0) * 54.7) + 1000).cast("long").alias("id"),
            (u32(hb, 1) / 2147483648.0 - 1.0).alias("x"),
            (u32(hb, 2) / 2147483648.0 - 1.0).alias("y"),
        )
    )
